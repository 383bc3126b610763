"""AFM — Attentional Factorization Machine (IJCAI'2017, arXiv:1708.04617).

Capability parity with ``torch_rechub/models/ranking/afm.py:16-65``: LR
first-order term + FM (no reduce) gated by an attention head
``softmax(relu(W y_fm) h)`` and projected through ``p``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import FM, LR, torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class AFM(nn.Module):
    fm_features: Tuple
    embed_dim: int
    t: int = 64

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.fm_features)
        input_fm = EmbeddingCollection(features=features)(x, features, squeeze_dim=False)
        y_linear = LR()(input_fm.reshape(input_fm.shape[0], -1))
        y_fm = FM(reduce_sum=False)(input_fm)  # (B, D)
        att = jax.nn.relu(nn.Dense(self.t, kernel_init=torch_linear_init, dtype=compute_dtype())(y_fm))
        h = self.param("h", nn.initializers.xavier_uniform(), (self.t, 1))
        p = self.param("p", nn.initializers.xavier_uniform(), (self.embed_dim, 1))
        atts = jax.nn.softmax(att @ h, axis=1)  # (B, 1)
        outs = (atts * y_fm) @ p  # (B, 1)
        return (y_linear + outs).squeeze(-1)
