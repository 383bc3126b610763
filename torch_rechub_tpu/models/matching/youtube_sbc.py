"""YoutubeSBC (RecSys'2019) — in-batch softmax with sampling-bias correction.

Capability parity with ``torch_rechub/models/matching/youtube_sbc.py:16-98``:
cosine user-item score matrix, log-frequency bias subtraction, circular
in-batch index gathering into ``(B, 1+n_neg)`` logits.  The circular index is
computed with jnp (static batch shape under jit — our loaders pad the final
batch, so no last-batch special case is needed).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class YoutubeSBC(nn.Module):
    user_features: Tuple
    item_features: Tuple
    sample_weight_feature: Tuple
    user_params: Dict[str, Any]
    item_params: Dict[str, Any]
    batch_size: int  # kept for API parity; actual batch comes from inputs
    n_neg: int = 3
    temperature: float = 1.0

    def setup(self):
        feats = tuple(self.user_features) + tuple(self.item_features) + tuple(self.sample_weight_feature)
        self.embedding = EmbeddingCollection(features=feats)
        self.user_mlp = MLP(output_layer=False, **self.user_params)
        self.item_mlp = MLP(output_layer=False, **self.item_params)

    def user_tower(self, x, training: bool = False):
        return self.user_mlp(self.embedding(x, tuple(self.user_features), squeeze_dim=True), training=training)

    def item_tower(self, x, training: bool = False):
        return self.item_mlp(self.embedding(x, tuple(self.item_features), squeeze_dim=True), training=training)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_emb = self.user_tower(x, training)
        item_emb = self.item_tower(x, training)
        b = user_emb.shape[0]
        pred = l2_normalize(user_emb, axis=1) @ l2_normalize(item_emb, axis=1).T  # (B, B) cosine
        sample_weight = self.embedding(x, tuple(self.sample_weight_feature), squeeze_dim=True).reshape(b)
        scores = pred - jnp.log(sample_weight)  # bias correction
        # circular gather: row i takes columns i, i+1, ..., i+n_neg (mod B)
        cols = (jnp.arange(b)[:, None] + jnp.arange(self.n_neg + 1)[None, :]) % b
        gathered = jnp.take_along_axis(scores, cols, axis=1)
        return gathered / self.temperature  # (B, 1+n_neg), positive at col 0
