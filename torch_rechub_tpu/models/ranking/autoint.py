"""AutoInt (CIKM'2019, arXiv:1810.11921).

Capability parity with ``torch_rechub/models/ranking/autoint.py:15-102``:
stacked multi-head InteractingLayers over the field embeddings, plus an LR
term over the flattened inputs and an optional MLP; dense features are
projected to the shared embed dim by per-feature ``Dense(1 -> D)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import LR, MLP, InteractingLayer, torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class AutoInt(nn.Module):
    sparse_features: Tuple
    dense_features: Tuple = ()
    num_layers: int = 3
    num_heads: int = 2
    dropout: float = 0.0
    mlp_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        sparse = tuple(self.sparse_features)
        dense = tuple(self.dense_features or ())
        if not sparse:
            raise ValueError("AutoInt requires at least one sparse feature to determine embed_dim.")
        embed_dim = sparse[0].embed_dim
        sparse_emb = EmbeddingCollection(features=sparse)(x, sparse, squeeze_dim=False)
        parts = [sparse_emb]
        for fea in dense:
            v = x[fea.name].astype(jnp.float32).reshape(-1, 1, 1)
            parts.append(nn.Dense(embed_dim, use_bias=False, kernel_init=torch_linear_init, name=f"dense_{fea.name}", dtype=compute_dtype())(v))
        embed_x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else sparse_emb
        flat = embed_x.reshape(embed_x.shape[0], -1)

        attn = embed_x
        for _ in range(self.num_layers):
            attn = InteractingLayer(embed_dim, num_heads=self.num_heads, dropout=self.dropout)(attn, training=training)
        y = nn.Dense(1, kernel_init=torch_linear_init, name="attn_linear", dtype=compute_dtype())(attn.reshape(attn.shape[0], -1))
        y = y + LR()(flat)
        if self.mlp_params is not None:
            y = y + MLP(**self.mlp_params)(flat, training=training)
        return y.squeeze(-1)
