"""DeepFM (IJCAI'2017, arXiv:1703.04247).

Capability parity with ``torch_rechub/models/ranking/deepfm.py:14-43``:
first-order LR + second-order FM over the fm features, MLP over the deep
features, summed into one logit.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn

from ...basic.layers import FM, LR, MLP
from ...ops.embedding import EmbeddingCollection


class DeepFM(nn.Module):
    deep_features: Tuple
    fm_features: Tuple
    mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        deep, fm = tuple(self.deep_features), tuple(self.fm_features)
        embedding = EmbeddingCollection(features=deep + fm)
        input_deep = embedding(x, deep, squeeze_dim=True)  # (B, ΣD)
        input_fm = embedding(x, fm, squeeze_dim=False)  # (B, F, D)
        y_linear = LR()(input_fm.reshape(input_fm.shape[0], -1))
        y_fm = FM(reduce_sum=True)(input_fm)
        y_deep = MLP(**self.mlp_params)(input_deep, training=training)
        return (y_linear + y_fm + y_deep).squeeze(-1)
