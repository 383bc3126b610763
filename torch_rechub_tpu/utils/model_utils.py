"""Model reflection: feature-schema recovery, dummy inputs, param/FLOP summary.

Parity with ``torch_rechub/utils/model_utils.py:28-232`` (``extract_feature_info``
scanning known feature attribute names, dummy-input generation) and the
``utils/visualization.py`` role (the torchview graph drawing becomes a
textual parameter/shape summary — the idiomatic JAX equivalent).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..basic.features import DenseFeature, SequenceFeature, SparseFeature

_FEATURE_ATTRS = (
    "features",
    "deep_features",
    "fm_features",
    "wide_features",
    "linear_features",
    "cross_features",
    "sparse_features",
    "dense_features",
    "user_features",
    "item_features",
    "history_features",
    "neg_history_features",
    "target_features",
    "neg_item_feature",
    "neg_item_features",
    "pos_item_features",
    "sample_weight_feature",
    "item_history_feature",
    "item_feature",
)


def extract_feature_info(model) -> Dict[str, List]:
    """Recover the input feature schema from a model's attributes.

    Mirrors the reference's attribute scan (``model_utils.py:28-109``); works
    on any model built from this framework's feature dataclasses.
    """
    info: Dict[str, List] = {}
    seen = set()
    for attr in _FEATURE_ATTRS:
        feats = getattr(model, attr, None)
        if feats is None:
            continue
        if not isinstance(feats, (list, tuple)):
            feats = (feats,)
        kept = []
        for f in feats:
            if isinstance(f, (SparseFeature, DenseFeature, SequenceFeature)) and id(f) not in seen:
                seen.add(id(f))
                kept.append(f)
        if kept:
            info[attr] = list(kept)
    return info


def generate_dummy_input(model=None, features=None, batch_size: int = 2, seq_length: int = 10, seed: int = 0) -> Dict[str, np.ndarray]:
    """Random dict input matching a model's (or an explicit) feature schema."""
    rng = np.random.default_rng(seed)
    if features is None:
        if model is None:
            raise ValueError("provide model or features")
        features = [f for group in extract_feature_info(model).values() for f in group]
    x: Dict[str, np.ndarray] = {}
    for f in features:
        if f.name in x:
            continue
        if isinstance(f, SequenceFeature):
            x[f.name] = rng.integers(1, f.vocab_size, (batch_size, seq_length)).astype(np.int32)
        elif isinstance(f, SparseFeature):
            x[f.name] = rng.integers(0, f.vocab_size, batch_size).astype(np.int32)
        else:
            if f.embed_dim > 1:
                x[f.name] = rng.normal(size=(batch_size, f.embed_dim)).astype(np.float32)
            else:
                x[f.name] = rng.normal(size=batch_size).astype(np.float32)
    return x


def count_parameters(variables_or_params) -> int:
    """Total trainable parameter count of a params pytree (or variables dict)."""
    params = variables_or_params.get("params", variables_or_params) if isinstance(variables_or_params, dict) else variables_or_params
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def model_summary(model, x: Optional[Dict] = None, variables=None, max_rows: int = 200) -> str:
    """Text summary: per-parameter shapes/sizes + totals + traced FLOP estimate.

    The JAX stand-in for ``utils/visualization.py``'s torchview graphs.
    """
    if x is None:
        x = generate_dummy_input(model)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), x, training=False)
    lines = [f"{type(model).__name__} summary", "=" * 60]
    rows = 0
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables.get("params", variables))[0]:
        n = int(np.prod(leaf.shape))
        total += n
        if rows < max_rows:
            lines.append(f"{jax.tree_util.keystr(path):<58} {str(tuple(leaf.shape)):<18} {n:>12,}")
            rows += 1
    lines.append("=" * 60)
    lines.append(f"total parameters: {total:,}")
    try:
        lowered = jax.jit(lambda v, x: model.apply(v, x, training=False)).lower(variables, x)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            lines.append(f"estimated forward FLOPs/batch: {int(cost['flops']):,}")
    except Exception:
        pass
    return "\n".join(lines)
