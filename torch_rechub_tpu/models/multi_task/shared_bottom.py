"""SharedBottom (Caruana 1997) multi-task model.

Capability parity with ``torch_rechub/models/multi_task/shared_bottom.py:14-45``:
one shared bottom MLP, per-task tower MLPs, per-task prediction head.
Outputs ``(B, n_task)`` probabilities (regression tasks pass through).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP, prediction
from ...ops.embedding import EmbeddingCollection


class SharedBottom(nn.Module):
    features: Tuple
    task_types: Tuple[str, ...]
    bottom_params: Dict[str, Any]
    tower_params_list: Tuple[Dict[str, Any], ...]

    def setup(self):
        self.embedding = EmbeddingCollection(features=tuple(self.features))
        self.bottom_mlp = MLP(**{**self.bottom_params, "output_layer": False})
        self.towers = [MLP(**self.tower_params_list[i]) for i in range(len(self.task_types))]

    def __call__(self, x, training: bool = False):
        h = self.bottom_mlp(self.embedding(x, tuple(self.features), squeeze_dim=True), training=training)
        ys = [prediction(tower(h, training=training), t) for tower, t in zip(self.towers, self.task_types)]
        return jnp.concatenate(ys, axis=1)
