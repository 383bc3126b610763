"""NARM (arXiv:1711.04725) — neural attentive session-based recommendation.

Capability parity with ``torch_rechub/models/matching/narm.py:18-105``: GRU
over the session, global (last hidden) + local (attention-weighted) session
representation, bilinear ``B`` projection; scores against the full item table
or two-tower mode via ``item_feature``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.rnn import GRULayer


class NARM(nn.Module):
    item_history_feature: object
    hidden_dim: int
    emb_dropout_p: float
    session_rep_dropout_p: float
    item_feature: Optional[object] = None

    def setup(self):
        fea = self.item_history_feature
        init = fea.initializer
        self.item_table = self.param("item_embedding", lambda k, s: init(k, s).at[0].set(0.0), (fea.vocab_size, fea.embed_dim))
        self.gru = GRULayer(self.hidden_dim)
        normal = nn.initializers.normal(1.0)
        self.a_1 = self.param("a_1", normal, (self.hidden_dim, self.hidden_dim))
        self.a_2 = self.param("a_2", normal, (self.hidden_dim, self.hidden_dim))
        self.v = self.param("v", normal, (self.hidden_dim, 1))
        self.b = self.param("b", normal, (fea.embed_dim, self.hidden_dim * 2))
        self.emb_dropout = nn.Dropout(self.emb_dropout_p)
        self.session_rep_dropout = nn.Dropout(self.session_rep_dropout_p)

    def _session_repr(self, x, training: bool):
        ids = x[self.item_history_feature.name].astype(jnp.int32)
        mask = (ids != 0).astype(jnp.float32)
        embs = jnp.take(self.item_table, ids, axis=0) * mask[..., None]
        embs = self.emb_dropout(embs, deterministic=not training)
        h, h_t = self.gru(embs, mask)  # outputs zeroed at pads; h_t = last valid
        c_g = h_t
        q = jax.nn.sigmoid(h_t[:, None, :] @ self.a_1.T + h @ self.a_2.T) @ self.v  # (B, L, 1)
        alpha = jnp.exp(q) * mask[..., None]
        alpha = alpha / jnp.maximum(jnp.sum(alpha, axis=1, keepdims=True), 1e-12)
        c_l = jnp.sum(alpha * h, axis=1)
        c = jnp.concatenate([c_g, c_l], axis=-1)
        return self.session_rep_dropout(c, deterministic=not training)

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        user = self._session_repr(x, training) @ self.b.T
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
        c = self._session_repr(x, training)
        return c @ self.b.T @ self.item_table.T  # full-softmax scores (B, V)
