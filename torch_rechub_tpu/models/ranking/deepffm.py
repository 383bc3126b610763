"""DeepFFM / FAT-DeepFFM (arXiv:1905.06336).

Capability parity with ``torch_rechub/models/ranking/deepffm.py:15-131``:
field-aware embeddings via the id-offset trick (``id * num_fields + field``,
so each cross feature's table must be declared with ``vocab * num_fields``
rows), FFM pairwise crosses -> MLP; FAT adds CEN field attention over the
crosses.  The linear term sums the (1-dim) linear embeddings.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...basic.layers import CEN, FFM, MLP
from ...ops.embedding import EmbeddingCollection


def _ffm_parts(mdl: nn.Module, x, linear_feats, cross_feats):
    """Shared linear-term + field-aware-cross computation (runs in caller's scope)."""
    num_fields = len(cross_feats)
    y_linear = EmbeddingCollection(features=linear_feats, name="linear_embedding")(x, linear_feats, squeeze_dim=True).sum(axis=1, keepdims=True)
    offset = jnp.arange(num_fields, dtype=jnp.int32)
    x_ffm = {f.name: x[f.name].astype(jnp.int32)[:, None] * num_fields + offset for f in cross_feats}
    input_ffm = EmbeddingCollection(features=cross_feats, name="ffm_embedding")(x_ffm, cross_feats, squeeze_dim=False)
    em = FFM(num_fields=num_fields, reduce_sum=False)(input_ffm)  # (B, P, D)
    b = mdl.param("b", nn.initializers.zeros, (1,))
    return y_linear, em, b


class DeepFFM(nn.Module):
    linear_features: Tuple
    cross_features: Tuple
    embed_dim: int
    mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        y_linear, em, b = _ffm_parts(self, x, tuple(self.linear_features), tuple(self.cross_features))
        y_ffm = MLP(**self.mlp_params)(em.reshape(em.shape[0], -1), training=training)
        return (y_linear + y_ffm).squeeze(-1) + b


class FatDeepFFM(nn.Module):
    linear_features: Tuple
    cross_features: Tuple
    embed_dim: int
    reduction_ratio: int
    mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        y_linear, em, b = _ffm_parts(self, x, tuple(self.linear_features), tuple(self.cross_features))
        num_cross = len(self.cross_features) * (len(self.cross_features) - 1) // 2
        aem = CEN(self.embed_dim, num_cross, self.reduction_ratio)(em, training=training)
        y_ffm = MLP(**self.mlp_params)(aem, training=training)
        return (y_linear + y_ffm).squeeze(-1) + b
