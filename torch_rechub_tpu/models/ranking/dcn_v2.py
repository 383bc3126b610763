"""DCN v2 (WWW'21, arXiv:2008.13535).

Capability parity with ``torch_rechub/models/ranking/dcn_v2.py:13-59``:
CrossNetV2 or CrossNetMix core with ``crossnet_only | stacked | parallel``
structures.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import LR, MLP, CrossNetMix, CrossNetV2
from ...ops.embedding import EmbeddingCollection


class DCNv2(nn.Module):
    features: Tuple
    n_cross_layers: int
    mlp_params: Dict[str, Any]
    model_structure: str = "parallel"
    use_low_rank_mixture: bool = True
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.model_structure not in ("crossnet_only", "stacked", "parallel"):
            raise ValueError(f"model_structure={self.model_structure} not supported!")
        features = tuple(self.features)
        embed_x = EmbeddingCollection(features=features)(x, features, squeeze_dim=True)
        if self.use_low_rank_mixture:
            cross_out = CrossNetMix(self.n_cross_layers, low_rank=self.low_rank, num_experts=self.num_experts)(embed_x)
        else:
            cross_out = CrossNetV2(self.n_cross_layers)(embed_x)
        if self.model_structure == "crossnet_only":
            final_out = cross_out
        elif self.model_structure == "stacked":
            final_out = MLP(output_layer=False, **self.mlp_params)(cross_out, training=training)
        else:
            dnn_out = MLP(output_layer=False, **self.mlp_params)(embed_x, training=training)
            final_out = jnp.concatenate([cross_out, dnn_out], axis=1)
        return LR()(final_out).squeeze(-1)
