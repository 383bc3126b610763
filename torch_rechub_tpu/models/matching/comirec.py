"""Comirec (arXiv:2005.09347) — controllable multi-interest retrieval.

Capability parity with ``torch_rechub/models/matching/comirec.py:17-189``:
same frame as MIND with two interest extractors — ComirecSA (self-attentive
``MultiInterestSA``) and ComirecDR (capsule routing, bilinear_type=2).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import CapsuleNetwork, MultiInterestSA
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class _ComirecBase(nn.Module):
    """Shared multi-interest two-tower frame (see MIND for the protocol)."""

    user_features: Tuple = ()
    history_features: Tuple = ()
    item_features: Tuple = ()
    neg_item_feature: Tuple = ()
    temperature: float = 1.0
    interest_num: int = 4

    def _setup_common(self):
        feats = tuple(self.user_features) + tuple(self.item_features) + tuple(self.history_features) + tuple(self.neg_item_feature)
        self.embedding = EmbeddingCollection(features=feats)
        user_dims = sum(f.embed_dim for f in tuple(self.user_features) + tuple(self.history_features))
        d = self.history_features[0].embed_dim
        self.convert_user_weight = self.param("convert_user_weight", nn.initializers.uniform(1.0), (user_dims, d))

    def _interests(self, hist, mask):  # pragma: no cover - abstract
        raise NotImplementedError

    def user_tower(self, x, training: bool = False):
        input_user = self.embedding(x, tuple(self.user_features), squeeze_dim=True)[:, None, :]
        input_user = jnp.broadcast_to(input_user, (input_user.shape[0], self.interest_num, input_user.shape[-1]))
        hist = self.embedding(x, tuple(self.history_features))[:, 0]
        mask = (x[self.history_features[0].name].astype(jnp.int32) > 0).astype(jnp.float32)
        multi_interest = self._interests(hist, mask)
        combined = jnp.concatenate([input_user, multi_interest], axis=-1)
        return l2_normalize(combined @ self.convert_user_weight, axis=-1)

    def item_tower(self, x, training: bool = False, with_negatives: bool = False):
        pos = l2_normalize(self.embedding(x, tuple(self.item_features)), axis=-1)
        if not with_negatives:
            return pos[:, 0, :]
        neg = l2_normalize(self.embedding(x, tuple(self.neg_item_feature))[:, 0], axis=-1)
        return jnp.concatenate([pos, neg], axis=1)

    def towers(self, x, training: bool = False):
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
        user = self.user_tower(x, training)
        item = self.item_tower(x, training, with_negatives=True)
        pos = item[:, 0, :]
        k_idx = jnp.argmax(jnp.einsum("bkd,bd->bk", user, pos), axis=1)
        best = jnp.take_along_axis(user, k_idx[:, None, None], axis=1)
        return jnp.sum(best * item, axis=-1)


class ComirecSA(_ComirecBase):
    def setup(self):
        self._setup_common()
        self.multi_interest_sa = MultiInterestSA(embedding_dim=self.history_features[0].embed_dim, interest_num=self.interest_num)

    def _interests(self, hist, mask):
        return self.multi_interest_sa(hist, mask[..., None])


class ComirecDR(_ComirecBase):
    max_length: int = 50

    def setup(self):
        self._setup_common()
        self.capsule = CapsuleNetwork(self.history_features[0].embed_dim, self.max_length, bilinear_type=2, interest_num=self.interest_num)

    def _interests(self, hist, mask):
        return self.capsule(hist, mask)
