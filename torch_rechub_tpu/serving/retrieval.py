"""Exact brute-force top-k retrieval on TPU.

The reference evaluates retrieval through an Annoy ANN index queried one
user at a time (``examples/matching/movielens_utils.py:15-58``).  On TPU the
exact computation is a single batched matmul + ``top_k`` — faster than ANN at
these scales, exact, and shardable: with a mesh, the item corpus is sharded
over devices, each shard computes a local top-k, and the shards' candidates
are merged (an all-gather of k·n_shards candidates instead of the full score
matrix).

``match_evaluation`` reproduces the reference's end-to-end recall protocol
including the multi-interest merge (best score per item across interests).
"""

from __future__ import annotations

import collections
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def brute_force_topk(user_emb, item_emb, k: int, batch_size: int = 8192, mesh=None):
    """Exact top-k items per user: returns (indices, scores), shape (U, k).

    With a mesh, item embeddings are sharded over all devices along the item
    axis and XLA handles the local-topk/merge pattern from the sharded matmul.
    """
    user_emb = jnp.asarray(user_emb, jnp.float32)
    item_emb = jnp.asarray(item_emb, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        flat_axes = tuple(mesh.axis_names)
        item_emb = jax.device_put(item_emb, NamedSharding(mesh, P(flat_axes if item_emb.shape[0] % mesh.size == 0 else None)))

    @jax.jit
    def _topk(u, it):
        scores = u @ it.T
        vals, idx = jax.lax.top_k(scores, k)
        return idx, vals

    all_idx, all_vals = [], []
    for start in range(0, user_emb.shape[0], batch_size):
        idx, vals = _topk(user_emb[start:start + batch_size], item_emb)
        all_idx.append(np.asarray(idx))
        all_vals.append(np.asarray(vals))
    return np.concatenate(all_idx), np.concatenate(all_vals)


def multi_interest_topk(user_emb, item_emb, k: int, mesh=None):
    """Top-k for (U, K, D) multi-interest users: best score per item across interests."""
    u, n_int, d = user_emb.shape
    idx, vals = brute_force_topk(user_emb.reshape(u * n_int, d), item_emb, k, mesh=mesh)
    idx = idx.reshape(u, n_int * k)
    vals = vals.reshape(u, n_int * k)
    out_idx = np.zeros((u, k), dtype=idx.dtype)
    for i in range(u):
        order = np.argsort(-vals[i], kind="stable")
        seen, picked = set(), []
        for j in order:
            if idx[i, j] not in seen:
                seen.add(idx[i, j])
                picked.append(idx[i, j])
                if len(picked) == k:
                    break
        while len(picked) < k:
            picked.append(picked[-1] if picked else 0)
        out_idx[i] = picked
    return out_idx


def match_evaluation(user_embedding, item_embedding, test_user, all_item, user_col="user_id", item_col="item_id", raw_id_maps: Optional[str] = None, topk: int = 10, mesh=None):
    """End-to-end retrieval eval: embed -> exact top-k -> topk_metrics.

    Mirrors ``movielens_utils.match_evaluation`` (reference) with the ANN
    replaced by exact TPU top-k.  ``raw_id_maps`` (optional .npy of
    (user_map, item_map)) restores raw ids before metric computation.
    """
    import pandas as pd

    from ..basic.metric import topk_metrics

    user_embedding = np.asarray(user_embedding)
    item_embedding = np.asarray(item_embedding)
    n_test = len(np.asarray(test_user[user_col]))
    if user_embedding.shape[0] != n_test:
        raise ValueError(f"user_embedding rows ({user_embedding.shape[0]}) must align 1:1 with test_user rows ({n_test})")
    if raw_id_maps is not None:
        user_map, item_map = np.load(raw_id_maps, allow_pickle=True)
    else:
        user_map = item_map = None

    if user_embedding.ndim == 3:
        idx = multi_interest_topk(user_embedding, item_embedding, topk, mesh=mesh)
    else:
        idx, _ = brute_force_topk(user_embedding, item_embedding, topk, mesh=mesh)

    match_res = collections.defaultdict(list)
    item_ids = np.asarray(all_item[item_col])
    for row, user_id in enumerate(np.asarray(test_user[user_col])):
        rec = item_ids[idx[row]]
        if item_map is not None:
            rec = np.vectorize(item_map.get)(rec)
        uid = user_map[user_id] if user_map is not None else user_id
        match_res[uid] = list(rec)

    data = pd.DataFrame({user_col: np.asarray(test_user[user_col]), item_col: np.asarray(test_user[item_col])})
    if user_map is not None:
        data[user_col] = data[user_col].map(user_map)
        data[item_col] = data[item_col].map(item_map)
    grouped = data.groupby(user_col).agg(list).reset_index()
    ground_truth = dict(zip(grouped[user_col], grouped[item_col]))

    out = topk_metrics(y_true=ground_truth, y_pred=match_res, topKs=[topk])
    print(out)
    return out
