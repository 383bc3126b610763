"""ESMM (SIGIR'2018, arXiv:1804.07931) — entire-space CVR modelling.

Capability parity with ``torch_rechub/models/multi_task/esmm.py:15-56``:
shared embeddings, CVR and CTR towers, ``ctcvr = ctr * cvr``; output order
``[cvr, ctr, ctcvr]`` probabilities.  The trainer computes loss only over
ctr + ctcvr.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection


class ESMM(nn.Module):
    user_features: Tuple
    item_features: Tuple
    cvr_params: Dict[str, Any]
    ctr_params: Dict[str, Any]

    def setup(self):
        self.embedding = EmbeddingCollection(features=tuple(self.user_features) + tuple(self.item_features))
        self.tower_cvr = MLP(**self.cvr_params)
        self.tower_ctr = MLP(**self.ctr_params)

    def __call__(self, x, training: bool = False):
        user = self.embedding(x, tuple(self.user_features), squeeze_dim=False)
        item = self.embedding(x, tuple(self.item_features), squeeze_dim=False)
        b = user.shape[0]
        input_tower = jnp.concatenate([user.reshape(b, -1), item.reshape(b, -1)], axis=1)
        cvr_pred = jax.nn.sigmoid(self.tower_cvr(input_tower, training=training))
        ctr_pred = jax.nn.sigmoid(self.tower_ctr(input_tower, training=training))
        ctcvr_pred = ctr_pred * cvr_pred
        return jnp.concatenate([cvr_pred, ctr_pred, ctcvr_pred], axis=1)
