"""MIND (arXiv:1904.08030) — multi-interest capsule retrieval.

Capability parity with ``torch_rechub/models/matching/mind.py:17-101``:
capsule network (bilinear_type=0) extracts ``interest_num`` user interests;
training selects the best interest by argmax dot with the positive item and
scores it against positive+negative items.  ``mode="user"`` returns the full
``(B, K, D)`` interest matrix for multi-interest retrieval.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import CapsuleNetwork
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class MIND(nn.Module):
    user_features: Tuple
    history_features: Tuple
    item_features: Tuple
    neg_item_feature: Tuple
    max_length: int
    temperature: float = 1.0
    interest_num: int = 4

    def setup(self):
        feats = tuple(self.user_features) + tuple(self.item_features) + tuple(self.history_features) + tuple(self.neg_item_feature)
        self.embedding = EmbeddingCollection(features=feats)
        d = self.history_features[0].embed_dim
        self.capsule = CapsuleNetwork(d, self.max_length, bilinear_type=0, interest_num=self.interest_num)
        user_dims = sum(f.embed_dim for f in tuple(self.user_features) + tuple(self.history_features))
        self.convert_user_weight = self.param("convert_user_weight", nn.initializers.uniform(1.0), (user_dims, d))

    def _mask(self, x):
        return (x[self.history_features[0].name].astype(jnp.int32) > 0).astype(jnp.float32)

    def user_tower(self, x, training: bool = False):
        input_user = self.embedding(x, tuple(self.user_features), squeeze_dim=True)[:, None, :]
        input_user = jnp.broadcast_to(input_user, (input_user.shape[0], self.interest_num, input_user.shape[-1]))
        hist = self.embedding(x, tuple(self.history_features))[:, 0]  # (B, L, D)
        multi_interest = self.capsule(hist, self._mask(x))  # (B, K, D)
        combined = jnp.concatenate([input_user, multi_interest], axis=-1)
        return l2_normalize(combined @ self.convert_user_weight, axis=-1)  # (B, K, D)

    def item_tower(self, x, training: bool = False, with_negatives: bool = False):
        pos = l2_normalize(self.embedding(x, tuple(self.item_features)), axis=-1)
        if not with_negatives:
            return pos[:, 0, :]
        neg = l2_normalize(self.embedding(x, tuple(self.neg_item_feature))[:, 0], axis=-1)
        return jnp.concatenate([pos, neg], axis=1)

    def towers(self, x, training: bool = False):
        # best-interest user embedding vs positive item (for in-batch training)
        user = self.user_tower(x, training)
        item = self.item_tower(x, training)
        k_idx = jnp.argmax(jnp.einsum("bkd,bd->bk", user, item), axis=1)
        best = jnp.take_along_axis(user, k_idx[:, None, None], axis=1)[:, 0]
        return best, item

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user = self.user_tower(x, training)  # (B, K, D)
        item = self.item_tower(x, training, with_negatives=True)  # (B, 1+n, D)
        pos = item[:, 0, :]
        k_idx = jnp.argmax(jnp.einsum("bkd,bd->bk", user, pos), axis=1)
        best = jnp.take_along_axis(user, k_idx[:, None, None], axis=1)  # (B, 1, D)
        return jnp.sum(best * item, axis=-1)  # (B, 1+n)
