"""Matching/retrieval data utilities.

Capability parity with ``torch_rechub/utils/match.py``: ``gen_model_input``
(profile merge + history padding), ``negative_sample`` (4 popularity
methods), ``generate_seq_feature_match`` (mode 0/1/2 sample construction
with leave-one-out test split), and the in-batch negative sampling pair
(``inbatch_negative_sampling`` + ``gather_inbatch_logits``).

TPU re-design: in-batch sampling is fully vectorized JAX (the reference
loops over rows in Python, ``utils/match.py:136-145``) — uniform sampling
without replacement is a per-row random top-k with the diagonal masked, hard
negatives are a plain top-k on scores; both are jit-compatible.
"""

from __future__ import annotations

import copy
import random
from collections import Counter, OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import df_to_dict, pad_sequences


def gen_model_input(df, user_profile, user_col, item_profile, item_col, seq_max_len, padding="pre", truncating="pre"):
    """Merge user/item profiles onto samples and pad every ``hist_*``/``tag_*`` column."""
    import pandas as pd

    df = pd.merge(df, user_profile, on=user_col, how="left")
    df = pd.merge(df, item_profile, on=item_col, how="left")
    for col in df.columns.to_list():
        if col.startswith("hist_") or col.startswith("tag_"):
            df[col] = pad_sequences(df[col], maxlen=seq_max_len, value=0, padding=padding, truncating=truncating).tolist()
    input_dict = df_to_dict(df)
    for k, v in input_dict.items():
        if v.dtype == object:  # list-valued columns (hist_*, tag_*, neg_items, ...)
            try:
                input_dict[k] = np.stack([np.asarray(r) for r in v])
            except ValueError:
                pass  # ragged non-sequence column: leave as-is
    return input_dict


def get_item_sample_weight(items):
    """Word2vec-style sampling probabilities per item id.

    Reference ``examples/matching/movielens_utils.py:61-67``: normalized
    ``count**0.75`` frequencies, used by YoutubeSBC as the log-bias
    correction term (served as a ``DenseFeature('sample_weight')``).
    """
    from collections import Counter

    powered = {item: count**0.75 for item, count in Counter(items).items()}
    total = sum(powered.values())
    return {item: p / total for item, p in powered.items()}


def negative_sample(items_cnt_order, ratio, method_id: int = 0):
    """Draw global negatives by popularity (reference ``utils/match.py:61-101``).

    Methods: 0 uniform; 1 ``count**0.75`` (word2vec); 2 ``log(count+1)+1e-6``;
    3 Tencent RALM rank-based (without replacement).
    """
    items = list(items_cnt_order.keys())
    counts = np.array(list(items_cnt_order.values()), dtype=np.float64)
    if method_id == 0:
        return np.random.choice(items, size=ratio, replace=True)
    if method_id == 1:
        p = counts**0.75
    elif method_id == 2:
        p = np.log(counts + 1) + 1e-6
    elif method_id == 3:
        ranks = counts  # values are ranks for RALM in the reference API
        p = (np.log(ranks + 2) - np.log(ranks + 1)) / np.log(len(items) + 1)
        return np.random.choice(items, size=ratio, replace=False, p=p / p.sum())
    else:
        raise ValueError("method id should in (0,1,2,3)")
    return np.random.choice(items, size=ratio, replace=True, p=p / p.sum())


def generate_seq_feature_match(data, user_col, item_col, time_col, item_attribute_cols=None, sample_method=0, mode=0, neg_ratio=0, min_item=0):
    """Sliding-window sequence samples + leave-one-out test split.

    Mode 0 point-wise (pos + ``neg_ratio`` labelled negatives), mode 1
    pair-wise (one ``neg_items`` per sample), mode 2 list-wise (``neg_ratio``
    negatives per sample).  Reference: ``utils/match.py:164-249``.
    """
    import pandas as pd

    item_attribute_cols = item_attribute_cols or []
    if mode == 2:
        assert neg_ratio > 0, "neg_ratio must be greater than 0 when list-wise learning"
    elif mode == 1:
        neg_ratio = 1
    data = data.sort_values(time_col)
    items_cnt = Counter(data[item_col].tolist())
    items_cnt_order = OrderedDict(sorted(items_cnt.items(), key=lambda kv: kv[1], reverse=True))
    neg_list = negative_sample(items_cnt_order, ratio=data.shape[0] * max(neg_ratio, 1), method_id=sample_method)
    neg_idx = 0
    train_set, test_set = [], []
    n_cold_user = 0
    last_col = "label"
    for uid, hist in data.groupby(user_col):
        pos_list = hist[item_col].tolist()
        if len(pos_list) < min_item:
            n_cold_user += 1
            continue
        for i in range(1, len(pos_list)):
            sample = [uid, pos_list[i], pos_list[:i], i]
            for attr_col in item_attribute_cols:
                sample.append(hist[attr_col].tolist()[:i])
            if i != len(pos_list) - 1:
                if mode == 0:
                    last_col = "label"
                    train_set.append(sample + [1])
                    for _ in range(neg_ratio):
                        neg_sample = copy.deepcopy(sample)
                        neg_sample[1] = neg_list[neg_idx]
                        neg_idx += 1
                        train_set.append(neg_sample + [0])
                elif mode == 1:
                    last_col = "neg_items"
                    for _ in range(neg_ratio):
                        train_set.append(copy.deepcopy(sample) + [neg_list[neg_idx]])
                        neg_idx += 1
                elif mode == 2:
                    last_col = "neg_items"
                    train_set.append(sample + [list(neg_list[neg_idx:neg_idx + neg_ratio])])
                    neg_idx += neg_ratio
                else:
                    raise ValueError("mode should in (0,1,2)")
            else:
                test_set.append(sample + [1])
    random.shuffle(train_set)
    random.shuffle(test_set)
    print(f"n_train: {len(train_set)}, n_test: {len(test_set)}")
    print(f"{n_cold_user} cold start user dropped")
    attr_hist_cols = ["hist_" + c for c in item_attribute_cols]
    cols = [user_col, item_col, "hist_" + item_col, "histlen_" + item_col] + attr_hist_cols + [last_col]
    return pd.DataFrame(train_set, columns=cols), pd.DataFrame(test_set, columns=cols)


# ---------------------------------------------------------------------------
# In-batch negative sampling (vectorized, jit-compatible)
# ---------------------------------------------------------------------------


def inbatch_negative_sampling(scores: jax.Array, neg_ratio: Optional[int] = None, hard_negative: bool = False, rng: Optional[jax.Array] = None) -> jax.Array:
    """Sample per-row negative indices from a ``(B, B)`` similarity matrix.

    Uniform mode draws ``neg_ratio`` distinct columns != i per row (random
    top-k trick); hard mode takes the top-``neg_ratio`` scores with the
    diagonal masked.  Returns ``(B, neg_ratio)`` int32 indices.
    """
    if scores.ndim != 2:
        raise ValueError(f"inbatch_negative_sampling expects 2D scores, got shape {scores.shape}")
    batch_size = scores.shape[0]
    if batch_size <= 1:
        raise ValueError("In-batch negative sampling requires batch_size > 1")
    max_neg = batch_size - 1
    if neg_ratio is None or neg_ratio <= 0 or neg_ratio > max_neg:
        neg_ratio = max_neg
    eye = jnp.eye(batch_size, dtype=bool)
    if hard_negative:
        masked = jnp.where(eye, -jnp.inf, scores)
        return jax.lax.top_k(masked, neg_ratio)[1].astype(jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jnp.where(eye, -jnp.inf, jax.random.uniform(rng, (batch_size, batch_size)))
    return jax.lax.top_k(keys, neg_ratio)[1].astype(jnp.int32)


def gather_inbatch_logits(scores: jax.Array, neg_indices: jax.Array) -> jax.Array:
    """``(B, 1+K)`` logits: diagonal positives + gathered negatives."""
    pos = jnp.diagonal(scores)[:, None]
    neg = jnp.take_along_axis(scores, neg_indices, axis=1)
    return jnp.concatenate([pos, neg], axis=1)


def inbatch_loss_from_logits(logits: jax.Array, mode: int, weight=None):
    """Weighted-sum/weight-sum pair for the ``(B, 1+K)`` in-batch logits.

    Returning the two sums (instead of the mean) lets callers combine shards
    exactly with ``psum`` — a mean of per-shard means would be wrong whenever
    pad-mask weights differ across shards.
    """
    logits = logits.astype(jnp.float32)  # losses stay f32 under bf16 compute
    if mode == 1:  # pair-wise BPR: positive column vs every sampled negative
        per_sample = -jnp.mean(jax.nn.log_sigmoid(logits[:, :1] - logits[:, 1:]), axis=1)
    else:  # list-wise CE with the positive fixed at column 0
        per_sample = -jax.nn.log_softmax(logits, axis=-1)[:, 0]
    w = jnp.ones_like(per_sample) if weight is None else weight.astype(per_sample.dtype).reshape(per_sample.shape)
    return jnp.sum(per_sample * w), jnp.sum(w)


def local_inbatch_loss(user_emb, item_emb, weight, rng, mesh, mode: int, neg_ratio: Optional[int] = None, hard_negative: bool = False, data_axis: str = "data"):
    """In-batch loss with a PER-SHARD negative pool (reference-DDP semantics).

    Under SPMD ``jit`` the plain ``user_emb @ item_emb.T`` path already spans
    the GLOBAL batch — XLA all-gathers the item tower over the data axis, so
    the default pool is an upgrade over the reference's per-process pool
    (``torch_rechub/trainers/match_trainer.py:118-138`` only ever sees the
    local DDP batch).  This function restores those per-process semantics the
    TPU way: a ``shard_map`` over the data axis computes a local ``(b, b)``
    score matrix per shard (no item all-gather rides the ICI), samples
    negatives with a shard-unique key, and combines shard losses exactly via
    ``psum`` of weighted-sum/weight-sum.  Gradients flow through ``shard_map``
    (it is differentiable), so the call sits directly inside a trainer
    ``loss_fn``.
    """
    from jax.sharding import PartitionSpec as P

    def shard_fn(u, it, w, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        scores = u @ it.T  # (b, b): this shard's batch only
        neg_idx = inbatch_negative_sampling(scores, neg_ratio=neg_ratio, hard_negative=hard_negative, rng=key)
        logits = gather_inbatch_logits(scores, neg_idx)
        loss_sum, w_sum = inbatch_loss_from_logits(logits, mode, weight=w)
        return jax.lax.psum(loss_sum, data_axis), jax.lax.psum(w_sum, data_axis)

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # jax < 0.4.35 only exports the experimental alias
        from jax.experimental.shard_map import shard_map
    loss_sum, w_sum = shard_map(shard_fn, mesh=mesh, in_specs=(P(data_axis), P(data_axis), P(data_axis), P()), out_specs=(P(), P()))(user_emb, item_emb, weight, rng)
    return loss_sum / jnp.maximum(w_sum, 1e-12)


# ---------------------------------------------------------------------------
# Legacy ANN engine wrappers (fit/query API used by example/benchmark eval;
# reference ``utils/match.py:252-497``).  Delegate to the serving backends.
# ---------------------------------------------------------------------------


class _LegacyEngine:
    """fit(X) / query(v, n) adapter over a serving BaseBuilder."""

    def __init__(self, builder):
        self._builder = builder
        self._indexer = None
        self._cm = None

    def fit(self, X):
        if self._cm is not None:
            self._cm.__exit__(None, None, None)
        self._cm = self._builder.from_embeddings(np.asarray(X))
        self._indexer = self._cm.__enter__()
        return self

    def query(self, v, n):
        ids, dists = self._indexer.query(np.asarray(v), n)
        if ids.shape[0] == 1 and np.asarray(v).ndim == 1:
            return ids[0].tolist(), dists[0].tolist()
        return ids, dists


class Annoy(_LegacyEngine):
    """Annoy-compatible engine; falls back to the native HNSW when annoy is absent."""

    def __init__(self, metric="angular", n_trees=10, search_k=-1):
        try:
            import annoy  # noqa: F401

            from ..serving.annoy import AnnoyBuilder

            super().__init__(AnnoyBuilder(metric=metric, n_trees=n_trees, search_k=search_k))
        except ImportError:
            from ..serving.hnsw import HnswBuilder

            hnsw_metric = {"angular": "angular", "euclidean": "l2", "dot": "ip"}.get(metric, "angular")
            super().__init__(HnswBuilder(metric=hnsw_metric, ef_search=max(64, search_k)))


class Faiss(_LegacyEngine):
    def __init__(self, index_key="Flat", metric="ip", **kwargs):
        try:
            import faiss  # noqa: F401

            from ..serving.faiss import FaissBuilder

            super().__init__(FaissBuilder(index_key=index_key, metric=metric, **kwargs))
        except ImportError:
            from ..serving.bruteforce import BruteForceBuilder

            super().__init__(BruteForceBuilder(metric=metric))


class Milvus(_LegacyEngine):
    def __init__(self, **kwargs):
        from ..serving.milvus import MilvusBuilder

        super().__init__(MilvusBuilder(**kwargs))
