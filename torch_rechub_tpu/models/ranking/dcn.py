"""Deep & Cross Network (ADKDD'2017, arXiv:1708.05123).

Capability parity with ``torch_rechub/models/ranking/dcn.py:14-38``: cross
network and MLP in parallel over the flattened embeddings, concat -> LR.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import LR, MLP, CrossNetwork
from ...ops.embedding import EmbeddingCollection


class DCN(nn.Module):
    features: Tuple
    n_cross_layers: int
    mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        embed_x = EmbeddingCollection(features=features)(x, features, squeeze_dim=True)
        cn_out = CrossNetwork(self.n_cross_layers)(embed_x)
        mlp_out = MLP(output_layer=False, **self.mlp_params)(embed_x, training=training)
        y = LR()(jnp.concatenate([cn_out, mlp_out], axis=1))
        return y.squeeze(-1)
