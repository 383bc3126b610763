"""YoutubeDNN (RecSys'2016) — list-wise sampled-softmax two-tower.

Capability parity with ``torch_rechub/models/matching/youtube_dnn.py:15-75``:
user MLP tower vs raw item embeddings; training output is the ``(B, 1+n_neg)``
temperature-scaled score matrix (positive first) for list-wise CE.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class YoutubeDNN(nn.Module):
    user_features: Tuple
    item_features: Tuple
    neg_item_feature: Tuple
    user_params: Dict[str, Any]
    temperature: float = 1.0

    def setup(self):
        feats = tuple(self.user_features) + tuple(self.item_features) + tuple(self.neg_item_feature)
        self.embedding = EmbeddingCollection(features=feats)
        self.user_mlp = MLP(output_layer=False, **self.user_params)

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        inp = self.embedding(x, tuple(self.user_features), squeeze_dim=True)
        emb = l2_normalize(self.user_mlp(inp, training=training), axis=-1)
        return emb[:, None, :] if keep_dim else emb

    def item_tower(self, x, training: bool = False, with_negatives: bool = False):
        pos = l2_normalize(self.embedding(x, tuple(self.item_features)), axis=-1)  # (B, 1, D)
        if not with_negatives:
            return pos[:, 0, :]
        neg = l2_normalize(self.embedding(x, tuple(self.neg_item_feature))[:, 0], axis=-1)  # (B, n_neg, D)
        return jnp.concatenate([pos, neg], axis=1)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_emb = self.user_tower(x, training, keep_dim=True)  # (B, 1, D)
        item_emb = self.item_tower(x, training, with_negatives=True)  # (B, 1+n_neg, D)
        return jnp.sum(user_emb * item_emb, axis=2) / self.temperature
