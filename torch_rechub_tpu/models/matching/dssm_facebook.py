"""FaceBookDSSM (KDD'2020, arXiv:2006.11632) — pair-wise two-tower.

Capability parity with ``torch_rechub/models/matching/dssm_facebook.py:15-77``:
shared item MLP over positive/negative item features; ``__call__`` returns
``(pos_score, neg_score)`` for BPR/Hinge training.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class FaceBookDSSM(nn.Module):
    user_features: Tuple
    pos_item_features: Tuple
    neg_item_features: Tuple
    user_params: Dict[str, Any]
    item_params: Dict[str, Any]
    temperature: float = 1.0

    def setup(self):
        feats = tuple(self.user_features) + tuple(self.pos_item_features) + tuple(self.neg_item_features)
        self.embedding = EmbeddingCollection(features=feats)
        self.user_mlp = MLP(output_layer=False, **self.user_params)
        self.item_mlp = MLP(output_layer=False, **self.item_params)

    def user_tower(self, x, training: bool = False):
        inp = self.embedding(x, tuple(self.user_features), squeeze_dim=True)
        return l2_normalize(self.user_mlp(inp, training=training), axis=1)

    def item_tower(self, x, training: bool = False):
        inp = self.embedding(x, tuple(self.pos_item_features), squeeze_dim=True)
        return self.item_mlp(inp, training=training)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), l2_normalize(self.item_tower(x, training), axis=1)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_emb = self.user_tower(x, training)
        pos_emb = l2_normalize(self.item_mlp(self.embedding(x, tuple(self.pos_item_features), squeeze_dim=True), training=training), axis=1)
        neg_emb = l2_normalize(self.item_mlp(self.embedding(x, tuple(self.neg_item_features), squeeze_dim=True), training=training), axis=1)
        pos_score = jnp.sum(user_emb * pos_emb, axis=1)
        neg_score = jnp.sum(user_emb * neg_emb, axis=1)
        return pos_score, neg_score
