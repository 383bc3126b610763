"""DSSM (CIKM'2013) and the SENet variant.

Capability parity with ``torch_rechub/models/matching/dssm.py:16-72`` and
``dssm_senet.py:15-87``: MLP towers over flattened embeddings, L2-normalized,
dot-product score.  ``__call__`` returns the raw dot score (the trainer's
point-wise BCE consumes logits; the reference applies sigmoid in-model).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.features import SequenceFeature, SparseFeature
from ...basic.layers import MLP, SENETLayer
from ...ops.embedding import EmbeddingCollection
from .base import l2_normalize


class DSSM(nn.Module):
    user_features: Tuple
    item_features: Tuple
    user_params: Dict[str, Any]
    item_params: Dict[str, Any]
    temperature: float = 1.0

    def setup(self):
        self.embedding = EmbeddingCollection(features=tuple(self.user_features) + tuple(self.item_features))
        self.user_mlp = MLP(output_layer=False, **self.user_params)
        self.item_mlp = MLP(output_layer=False, **self.item_params)

    def user_tower(self, x, training: bool = False):
        input_user = self.embedding(x, tuple(self.user_features), squeeze_dim=True)
        return l2_normalize(self.user_mlp(input_user, training=training), axis=1)

    def item_tower(self, x, training: bool = False):
        input_item = self.embedding(x, tuple(self.item_features), squeeze_dim=True)
        return l2_normalize(self.item_mlp(input_item, training=training), axis=1)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_embedding, item_embedding = self.towers(x, training)
        return jnp.sum(user_embedding * item_embedding, axis=1)


class DSSMSENet(nn.Module):
    """DSSM with SENet field gating in both towers (``dssm_senet.py:15-87``)."""

    user_features: Tuple
    item_features: Tuple
    user_params: Dict[str, Any]
    item_params: Dict[str, Any]
    temperature: float = 1.0

    def setup(self):
        user, item = tuple(self.user_features), tuple(self.item_features)
        self.embedding = EmbeddingCollection(features=user + item)
        self.user_mlp = MLP(output_layer=False, **self.user_params)
        self.item_mlp = MLP(output_layer=False, **self.item_params)
        self.n_user = len([f for f in user if isinstance(f, (SparseFeature, SequenceFeature))])
        self.n_item = len([f for f in item if isinstance(f, (SparseFeature, SequenceFeature))])
        self.user_senet = SENETLayer(self.n_user)
        self.item_senet = SENETLayer(self.n_item)

    def _tower(self, x, features, n_fields, senet, mlp, training):
        inp = self.embedding(x, features, squeeze_dim=True)
        inp = senet(inp.reshape(inp.shape[0], n_fields, -1)).reshape(inp.shape[0], -1)
        return l2_normalize(mlp(inp, training=training), axis=1)

    def user_tower(self, x, training: bool = False):
        return self._tower(x, tuple(self.user_features), self.n_user, self.user_senet, self.user_mlp, training)

    def item_tower(self, x, training: bool = False):
        return self._tower(x, tuple(self.item_features), self.n_item, self.item_senet, self.item_mlp, training)

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        user_embedding, item_embedding = self.towers(x, training)
        return jnp.sum(user_embedding * item_embedding, axis=1) / self.temperature
