"""Wide & Deep (DLRS'2016, arXiv:1606.07792).

Capability parity with ``torch_rechub/models/ranking/widedeep.py:14-41``:
LR over the wide features + MLP over the deep features, summed.  Emits
logits; the trainer applies sigmoid for probabilities.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn

from ...basic.layers import LR, MLP
from ...ops.embedding import EmbeddingCollection


class WideDeep(nn.Module):
    wide_features: Tuple
    deep_features: Tuple
    mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        wide, deep = tuple(self.wide_features), tuple(self.deep_features)
        embedding = EmbeddingCollection(features=wide + deep)
        input_wide = embedding(x, wide, squeeze_dim=True)
        input_deep = embedding(x, deep, squeeze_dim=True)
        y_wide = LR()(input_wide)
        y_deep = MLP(**self.mlp_params)(input_deep, training=training)
        return (y_wide + y_deep).squeeze(-1)
