"""MMOE (KDD'2018) — multi-gate mixture of experts.

Capability parity with ``torch_rechub/models/multi_task/mmoe.py:15-58``:
n shared experts, per-task softmax gates, per-task towers.  The reference's
per-expert Python loop becomes a single stacked computation (experts share
one MLP applied via vmapped parameters would change init; we keep separate
expert MLPs — n_expert is small — but gather their outputs into one tensor).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP, prediction
from ...ops.embedding import EmbeddingCollection


class MMOE(nn.Module):
    features: Tuple
    task_types: Tuple[str, ...]
    n_expert: int
    expert_params: Dict[str, Any]
    tower_params_list: Tuple[Dict[str, Any], ...]

    def setup(self):
        self.embedding = EmbeddingCollection(features=tuple(self.features))
        self.experts = [MLP(output_layer=False, **self.expert_params) for _ in range(self.n_expert)]
        n_task = len(self.task_types)
        self.gates = [MLP(output_layer=False, dims=(self.n_expert,), activation="softmax") for _ in range(n_task)]
        self.towers = [MLP(**self.tower_params_list[i]) for i in range(n_task)]

    def __call__(self, x, training: bool = False):
        embed_x = self.embedding(x, tuple(self.features), squeeze_dim=True)
        expert_outs = jnp.stack([e(embed_x, training=training) for e in self.experts], axis=1)  # (B, E, D)
        ys = []
        for gate, tower, task_type in zip(self.gates, self.towers, self.task_types):
            g = gate(embed_x, training=training)  # (B, E) softmax
            pooled = jnp.einsum("be,bed->bd", g, expert_outs)
            ys.append(prediction(tower(pooled, training=training), task_type))
        return jnp.concatenate(ys, axis=1)
