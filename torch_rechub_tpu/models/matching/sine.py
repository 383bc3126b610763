"""SINE (arXiv:2102.09267) — sparse-interest network.

Capability parity with ``torch_rechub/models/matching/sine.py:15-148``:
concept prototypes, top-k sparse intention activation, per-intention
attention encoding, adaptive aggregation into one user vector — all einsum.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import l2_normalize


class SINE(nn.Module):
    history_features: Tuple  # feature NAMES (str), matching the reference API
    item_features: Tuple
    neg_item_features: Tuple
    num_items: int
    embedding_dim: int
    hidden_dim: int
    num_concept: int
    num_intention: int
    seq_max_len: int
    num_heads: int = 1
    temperature: float = 1.0

    def setup(self):
        std = 1e-4
        normal = nn.initializers.normal(std)
        uniform = nn.initializers.uniform(1.0)
        d, h = self.embedding_dim, self.hidden_dim
        self.item_embedding = self.param("item_embedding", normal, (self.num_items, d))
        self.concept_embedding = self.param("concept_embedding", normal, (self.num_concept, d))
        self.position_embedding = self.param("position_embedding", normal, (self.seq_max_len, d))
        self.w_1 = self.param("w_1", uniform, (d, h))
        self.w_2 = self.param("w_2", uniform, (h, self.num_heads))
        self.w_3 = self.param("w_3", uniform, (d, d))
        self.w_k1 = self.param("w_k1", uniform, (d, h))
        self.w_k2 = self.param("w_k2", uniform, (h, self.num_intention))
        self.w_4 = self.param("w_4", uniform, (d, h))
        self.w_5 = self.param("w_5", uniform, (h, self.num_heads))

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        hist = x[self.history_features[0]].astype(jnp.int32)
        x_u = jnp.take(self.item_embedding, hist, axis=0) + self.position_embedding[None]
        mask = (hist > 0).astype(jnp.float32)[..., None]  # (B, L, 1)

        # virtual concept vector z_u via masked self-attention
        h_1 = jnp.tanh(jnp.einsum("bse,ed->bsd", x_u, self.w_1))
        a_hist = jax.nn.softmax(jnp.einsum("bsd,dh->bsh", h_1, self.w_2) - 1e9 * (1.0 - mask), axis=1)
        z_u = jnp.einsum("bse,bsh->be", x_u, a_hist)

        # top-k concept activation
        s_u = z_u @ self.concept_embedding.T  # (B, C)
        top_vals, top_idx = jax.lax.top_k(s_u, self.num_intention)
        c_u = jax.nn.sigmoid(top_vals)[..., None] * jnp.take(self.concept_embedding, top_idx, axis=0)  # (B, K, D)

        # intention assignment P_{k|t}
        p_u = jax.nn.softmax(jnp.einsum("bse,bke->bks", l2_normalize(x_u @ self.w_3), l2_normalize(c_u)), axis=1)

        # attention weighing P_{t|k}
        h_2 = jnp.tanh(jnp.einsum("bse,ed->bsd", x_u, self.w_k1))
        a_concept = jax.nn.softmax(jnp.einsum("bsd,dk->bsk", h_2, self.w_k2) - 1e9 * (1.0 - mask), axis=1)

        # multi-interest encoding
        phi_u = jnp.einsum("bks,bse->bke", p_u * jnp.swapaxes(a_concept, 1, 2), x_u)

        # adaptive aggregation
        x_u_hat = jnp.einsum("bks,bke->bse", p_u, c_u)
        h_3 = jnp.tanh(jnp.einsum("bse,ed->bsd", x_u_hat, self.w_4))
        agg_logits = jnp.einsum("bsd,dh->bsh", h_3, self.w_5).reshape(-1, self.seq_max_len)
        agg = jax.nn.softmax(agg_logits - 1e9 * (1.0 - mask[..., 0]), axis=1)
        c_u_apt = l2_normalize(jnp.einsum("bs,bse->be", agg, x_u_hat))
        e_u = jax.nn.softmax(jnp.einsum("be,bke->bk", c_u_apt, phi_u) / self.temperature, axis=1)
        v_u = jnp.einsum("bk,bke->be", e_u, phi_u)
        return v_u[:, None, :] if keep_dim else v_u

    def item_tower(self, x, training: bool = False, with_negatives: bool = False):
        pos = jnp.take(self.item_embedding, x[self.item_features[0]].astype(jnp.int32), axis=0)[:, None, :]
        if not with_negatives:
            return pos[:, 0, :]
        neg = jnp.take(self.item_embedding, x[self.neg_item_features[0]].astype(jnp.int32), axis=0)
        if neg.ndim == 4:
            neg = neg[:, 0]
        return jnp.concatenate([pos, neg], axis=1)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user = self.user_tower(x, training, keep_dim=True)
        item = self.item_tower(x, training, with_negatives=True)
        return jnp.sum(user * item, axis=-1)
