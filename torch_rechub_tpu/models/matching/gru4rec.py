"""GRU4Rec (arXiv:1511.06939) adapted to the two-tower protocol.

Capability parity with ``torch_rechub/models/matching/gru4rec.py:16-85``:
multi-layer GRU (no bias) over the history embeddings, final hidden state
concatenated with user features into the user MLP; items as in YoutubeDNN.
The reference runs the GRU over the full padded sequence (no packing) — we
reproduce that with a ``lax.scan`` per layer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection
from ...ops.rnn import GRULayer
from .base import l2_normalize


class GRU4Rec(nn.Module):
    user_features: Tuple
    history_features: Tuple
    item_features: Tuple
    neg_item_feature: Tuple
    user_params: Dict[str, Any]
    temperature: float = 1.0

    def setup(self):
        feats = tuple(self.user_features) + tuple(self.item_features) + tuple(self.history_features) + tuple(self.neg_item_feature)
        self.embedding = EmbeddingCollection(features=feats)
        d = self.history_features[0].embed_dim
        num_layers = self.user_params.get("num_layers", 2)
        self.gru_layers = [GRULayer(d, use_bias=False) for _ in range(num_layers)]
        mlp_params = {k: v for k, v in self.user_params.items() if k != "num_layers"}
        self.user_mlp = MLP(output_layer=False, **mlp_params)

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        input_user = self.embedding(x, tuple(self.user_features), squeeze_dim=True)
        hist = self.embedding(x, tuple(self.history_features))[:, 0]  # (B, L, D)
        h = hist
        h_last = None
        for gru in self.gru_layers:
            h, h_last = gru(h)
        emb = self.user_mlp(jnp.concatenate([input_user, h_last], axis=-1), training=training)
        emb = l2_normalize(emb, axis=-1)
        return emb[:, None, :] if keep_dim else emb

    def item_tower(self, x, training: bool = False, with_negatives: bool = False):
        pos = l2_normalize(self.embedding(x, tuple(self.item_features)), axis=-1)
        if not with_negatives:
            return pos[:, 0, :]
        neg = l2_normalize(self.embedding(x, tuple(self.neg_item_feature))[:, 0], axis=-1)
        return jnp.concatenate([pos, neg], axis=1)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_emb = self.user_tower(x, training, keep_dim=True)
        item_emb = self.item_tower(x, training, with_negatives=True)
        return jnp.sum(user_emb * item_emb, axis=2) / self.temperature
