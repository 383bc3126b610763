"""PLE (RecSys'2020) — progressive layered extraction.

Capability parity with ``torch_rechub/models/multi_task/ple.py:15-116``:
stacked CGC layers with task-specific + shared experts; specific gates per
task, shared gate on non-final levels.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP, prediction
from ...ops.embedding import EmbeddingCollection


class CGC(nn.Module):
    cur_level: int
    n_level: int
    n_task: int
    n_expert_specific: int
    n_expert_shared: int
    expert_params: Dict[str, Any]

    def setup(self):
        n_all = self.n_expert_specific * self.n_task + self.n_expert_shared
        self.experts_specific = [MLP(output_layer=False, **self.expert_params) for _ in range(self.n_task * self.n_expert_specific)]
        self.experts_shared = [MLP(output_layer=False, **self.expert_params) for _ in range(self.n_expert_shared)]
        self.gates_specific = [MLP(output_layer=False, dims=(self.n_expert_specific + self.n_expert_shared,), activation="softmax") for _ in range(self.n_task)]
        if self.cur_level < self.n_level:
            self.gate_shared = MLP(output_layer=False, dims=(n_all,), activation="softmax")

    def __call__(self, x_list, training: bool = False):
        ns = self.n_expert_specific
        specific_outs = []  # per task group
        for i in range(self.n_task):
            specific_outs.extend(e(x_list[i], training=training)[:, None, :] for e in self.experts_specific[i * ns:(i + 1) * ns])
        shared_outs = [e(x_list[-1], training=training)[:, None, :] for e in self.experts_shared]
        outs = []
        for i, gate in enumerate(self.gates_specific):
            g = gate(x_list[i], training=training)[..., None]  # (B, ns+nsh, 1)
            experts = jnp.concatenate(specific_outs[i * ns:(i + 1) * ns] + shared_outs, axis=1)
            outs.append(jnp.sum(g * experts, axis=1))
        if self.cur_level < self.n_level:
            g = self.gate_shared(x_list[-1], training=training)[..., None]
            experts = jnp.concatenate(specific_outs + shared_outs, axis=1)
            outs.append(jnp.sum(g * experts, axis=1))
        return outs


class PLE(nn.Module):
    features: Tuple
    task_types: Tuple[str, ...]
    n_level: int
    n_expert_specific: int
    n_expert_shared: int
    expert_params: Dict[str, Any]
    tower_params_list: Tuple[Dict[str, Any], ...]

    def setup(self):
        n_task = len(self.task_types)
        self.embedding = EmbeddingCollection(features=tuple(self.features))
        self.cgc_layers = [CGC(i + 1, self.n_level, n_task, self.n_expert_specific, self.n_expert_shared, self.expert_params) for i in range(self.n_level)]
        self.towers = [MLP(**self.tower_params_list[i]) for i in range(n_task)]

    def __call__(self, x, training: bool = False):
        embed_x = self.embedding(x, tuple(self.features), squeeze_dim=True)
        n_task = len(self.task_types)
        ple_inputs = [embed_x] * (n_task + 1)
        ple_outs = ple_inputs
        for cgc in self.cgc_layers:
            ple_outs = cgc(ple_inputs, training=training)
            ple_inputs = ple_outs
        ys = [prediction(tower(out, training=training), t) for out, tower, t in zip(ple_outs, self.towers, self.task_types)]
        return jnp.concatenate(ys, axis=1)
