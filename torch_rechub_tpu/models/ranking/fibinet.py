"""FiBiNet (RecSys'19).

Capability parity with ``torch_rechub/models/ranking/fibinet.py:15-42``:
SENet field re-weighting + bilinear interactions of both the raw and the
SENet-gated embeddings (one shared bilinear layer), concat -> MLP.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.features import SparseFeature
from ...basic.layers import MLP, BiLinearInteractionLayer, SENETLayer
from ...ops.embedding import EmbeddingCollection


class FiBiNet(nn.Module):
    features: Tuple
    mlp_params: Dict[str, Any]
    reduction_ratio: int = 3
    bilinear_type: str = "field_interaction"

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        num_fields = len([f for f in features if isinstance(f, SparseFeature) and f.shared_with is None])
        embed_x = EmbeddingCollection(features=features)(x, features)
        embed_senet = SENETLayer(num_fields, self.reduction_ratio)(embed_x)
        bilinear = BiLinearInteractionLayer(num_fields, self.bilinear_type)
        embed_bi1 = bilinear(embed_x)
        embed_bi2 = bilinear(embed_senet)
        shallow = jnp.concatenate([embed_bi1, embed_bi2], axis=1).reshape(embed_x.shape[0], -1)
        out = MLP(**self.mlp_params)(shallow, training=training)
        return out.squeeze(-1)
