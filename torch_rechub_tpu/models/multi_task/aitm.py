"""AITM (KDD'2021, arXiv:2105.08489) — adaptive information transfer.

Capability parity with ``torch_rechub/models/multi_task/aitm.py:16-83``: per
task bottoms + towers; task i receives attention-fused info from task i-1
through an info gate + 2-token attention.  All tasks binary classification.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP, torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class AttentionLayer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, 2, D) -> (B, D)
        dense = lambda name: nn.Dense(self.dim, use_bias=False, kernel_init=torch_linear_init, name=name, dtype=compute_dtype())
        q, k, v = dense("q_layer")(x), dense("k_layer")(x), dense("v_layer")(x)
        a = jax.nn.softmax(jnp.sum(q * k, axis=-1) / jnp.sqrt(float(self.dim)), axis=1)
        return jnp.sum(a[..., None] * v, axis=1)


class AITM(nn.Module):
    features: Tuple
    n_task: int
    bottom_params: Dict[str, Any]
    tower_params_list: Tuple[Dict[str, Any], ...]

    def setup(self):
        self.embedding = EmbeddingCollection(features=tuple(self.features))
        d = self.bottom_params["dims"][-1]
        self.bottoms = [MLP(output_layer=False, **self.bottom_params) for _ in range(self.n_task)]
        self.towers = [MLP(**self.tower_params_list[i]) for i in range(self.n_task)]
        self.info_gates = [MLP(output_layer=False, dims=(d,)) for _ in range(self.n_task - 1)]
        self.aits = [AttentionLayer(d) for _ in range(self.n_task - 1)]

    def __call__(self, x, training: bool = False):
        embed_x = self.embedding(x, tuple(self.features), squeeze_dim=True)
        input_towers = [b(embed_x, training=training) for b in self.bottoms]
        for i in range(1, self.n_task):
            info = self.info_gates[i - 1](input_towers[i - 1], training=training)[:, None, :]
            ait_input = jnp.concatenate([input_towers[i][:, None, :], info], axis=1)
            input_towers[i] = self.aits[i - 1](ait_input)
        ys = [jax.nn.sigmoid(tower(h, training=training)) for h, tower in zip(input_towers, self.towers)]
        return jnp.concatenate(ys, axis=1)
