"""STAMP (KDD'2018) — short-term attention/memory priority.

Capability parity with ``torch_rechub/models/matching/stamp.py:15-109``:
attention over session items conditioned on the last click ``x_t`` and the
session mean ``m_s``; user representation ``h_s * h_t``; full-item scores or
two-tower mode via ``item_feature``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from ...basic.precision import compute_dtype


class STAMP(nn.Module):
    item_history_feature: object
    weight_std: float
    emb_std: float
    item_feature: Optional[object] = None

    def setup(self):
        fea = self.item_history_feature
        d = fea.embed_dim
        wn = nn.initializers.normal(self.weight_std)
        en = nn.initializers.normal(self.emb_std)
        self.item_table = self.param("item_embedding", en, (fea.vocab_size, d))
        self.w_0 = self.param("w_0", wn, (d, 1))
        self.w_1_t = self.param("w_1_t", wn, (d, d))
        self.w_2_t = self.param("w_2_t", wn, (d, d))
        self.w_3_t = self.param("w_3_t", wn, (d, d))
        self.b_a = self.param("b_a", nn.initializers.zeros, (d,))
        self.f_s = nn.Dense(d, kernel_init=en, bias_init=nn.initializers.zeros, dtype=compute_dtype())
        self.f_t = nn.Dense(d, kernel_init=en, bias_init=nn.initializers.zeros, dtype=compute_dtype())

    def _user_repr(self, x):
        ids = x[self.item_history_feature.name].astype(jnp.int32)
        mask = (ids != 0)[..., None]  # (B, L, 1)
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1)  # (B, 1)
        embs = jnp.take(self.item_table, ids, axis=0) * mask
        last_idx = jnp.maximum(counts - 1, 0)  # (B, 1) index of last valid
        last_ids = jnp.take_along_axis(ids, last_idx, axis=1)  # (B, 1)
        x_t = jnp.take(self.item_table, last_ids, axis=0)  # (B, 1, D)
        m_s = (jnp.sum(embs, axis=1) / counts)[:, None, :]  # (B, 1, D)
        gate = jax.nn.sigmoid(embs @ self.w_1_t + x_t @ self.w_2_t + m_s @ self.w_3_t + self.b_a)
        a = jnp.exp(gate @ self.w_0) * mask  # (B, L, 1)
        a = a / jnp.maximum(jnp.sum(jnp.abs(a), axis=1, keepdims=True), 1e-12)  # L1 normalize
        m_a = jnp.sum(a * embs, axis=1) + m_s[:, 0]
        h_s = self.f_s(jnp.tanh(m_a))
        h_t = self.f_t(jnp.tanh(x_t))[:, 0]
        return h_s * h_t

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        user = self._user_repr(x)
        return user[:, None, :] if keep_dim else user

    def item_tower(self, x, training: bool = False, keep_dim: bool = False):
        if self.item_feature is None:
            return None
        emb = jnp.take(self.item_table, x[self.item_feature.name].astype(jnp.int32), axis=0)
        return emb[:, None, :] if keep_dim else emb

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        if self.item_feature is not None:
            return jnp.sum(self.user_tower(x, training) * self.item_tower(x, training), axis=-1)
        return self._user_repr(x) @ self.item_table.T
