"""Row-wise sparse optimizer updates for fused embedding tables.

At production vocab sizes (e.g. Criteo-full: 26 tables x ~1M rows) a dense
gradient + dense optimizer pass over the table dominates the train step —
measured ~14 ms/step on a v5e for a (26M, 16) fused table, vs microseconds
of actual gather work.  The reference (torch ``nn.Embedding`` + dense Adam,
``torch_rechub/basic/layers.py:60-75``) has the same asymptotics; this module
is the TPU-native fix: update ONLY the rows a batch touched.

- ``sparse_sgd_update``: one ``scatter-add`` into the table — mathematically
  identical to dense SGD (duplicate ids accumulate, untouched rows unchanged).
- ``rowwise_adagrad_update``: the standard embedding-engine optimizer
  (TorchRec's default for fused tables): one accumulator scalar per row.
  Duplicate ids within a batch are deduplicated (sorted ``jnp.unique`` +
  ``segment_sum``) so the accumulator sees each row once per step.

The trainer obtains ``(ids, d loss/d rows)`` pairs without densifying via the
``nn.perturb`` / ``embedding_ids`` hooks in
:class:`~torch_rechub_tpu.ops.embedding.EmbeddingCollection`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

TABLE_PREFIX = "fused_d"
TABLE_SUFFIX = "_table"


def is_fused_table_key(name) -> bool:
    return isinstance(name, str) and name.startswith(TABLE_PREFIX) and name.endswith(TABLE_SUFFIX)


def split_fused_tables(params, extra_names: Tuple[str, ...] = ()) -> Tuple[Dict, Dict]:
    """Partition a params pytree into (sparse-table leaves, everything else).

    Sparse tables are the fused ``fused_d{D}_table`` params plus any leaf
    whose name is listed in ``extra_names`` (models with a NAMED standalone
    table carrying perturb/sow hooks, e.g. HSTU's untied ``token_embedding``).
    Both returned values are flat ``{path tuple: leaf}`` dicts
    (``flax.traverse_util`` convention).
    """
    flat = traverse_util.flatten_dict(params)
    tables = {k: v for k, v in flat.items() if is_fused_table_key(k[-1]) or k[-1] in extra_names}
    rest = {k: v for k, v in flat.items() if k not in tables}
    return tables, rest


def merge_params(tables_flat: Dict, rest_flat: Dict):
    return traverse_util.unflatten_dict({**tables_flat, **rest_flat})


def sparse_sgd_update(table, flat_ids, flat_grads, lr, weight_decay: float = 0.0):
    """SGD on touched rows only: ``W[ids] -= lr * g`` via one scatter-add.

    Identical numerics to a dense SGD step (duplicates accumulate through the
    scatter exactly like a dense gradient would).  ``weight_decay`` applies
    lazily to touched rows (decoupled, row applied once per occurrence — use
    adagrad for exact dedup semantics).
    """
    upd = (-lr * flat_grads).astype(table.dtype)
    new = table.at[flat_ids].add(upd)
    if weight_decay:
        new = new.at[flat_ids].add(-lr * weight_decay * table[flat_ids])
    return new


def rowwise_adagrad_update(table, accum, flat_ids, flat_grads, lr, eps: float = 1e-10, weight_decay: float = 0.0, spare_row: int = -1):
    """Row-wise Adagrad on touched rows with in-batch dedup.

    Args:
        table: ``(R, D)`` fused table.
        accum: ``(R,)`` per-row accumulator of mean squared gradients.
        flat_ids: ``(N,)`` int32 global row ids (duplicates allowed).
        flat_grads: ``(N, D)`` gradients d loss / d gathered rows.
        spare_row: row index used as the dedup fill target; defaults to the
            table's last row, which is always a padded spare (fused tables pad
            to the next row multiple).

    Returns ``(new_table, new_accum)``.
    """
    n = flat_ids.shape[0]
    fill = table.shape[0] - 1 if spare_row < 0 else spare_row
    u, inv = jnp.unique(flat_ids, size=n, fill_value=fill, return_inverse=True)
    seg = jax.ops.segment_sum(flat_grads, inv.reshape(-1), num_segments=n)  # (N, D) per-unique sums
    valid = (u != fill).astype(table.dtype)
    gg = jnp.mean(seg * seg, axis=-1) * valid  # row-wise mean-square, fill slots contribute 0
    new_accum = accum.at[u].add(gg)
    scale = (lr / (jnp.sqrt(new_accum[u]) + eps)) * valid
    upd = -scale[:, None] * seg
    if weight_decay:
        upd = upd - (lr * weight_decay * valid)[:, None] * table[u]
    return table.at[u].add(upd.astype(table.dtype)), new_accum


def init_accumulators(tables_flat: Dict):
    """Zero row-wise accumulators matching a flat dict of fused tables."""
    return {k: jnp.zeros((v.shape[0],), jnp.float32) for k, v in tables_flat.items()}


def pair_sparse_grads(pert_grads, ids_tree):
    """Match perturbation grads to their sown ids and owning table key.

    Yields ``(table_key, flat_ids (N,), flat_grads (N, D))`` with everything
    flattened over batch/position axes.  Two tag forms:

    - ``demb_d{D}_{crc}`` — fused dim-group gather (EmbeddingCollection);
      the table is the scope's ``fused_d{D}_table``.
    - ``demb_named_{param}`` — a named standalone table (e.g. HSTU's untied
      ``token_embedding``); the table is the scope's ``{param}`` leaf.
    """
    pg = traverse_util.flatten_dict(pert_grads)
    ids_flat = traverse_util.flatten_dict(ids_tree)
    for path, demb in pg.items():
        name = path[-1]
        if not name.startswith("demb_"):
            continue
        tag = name[len("demb_"):]
        scope = path[:-1]
        ids_leaf = ids_flat[scope + (f"ids_{tag}",)]
        ids = ids_leaf[0] if isinstance(ids_leaf, tuple) else ids_leaf
        if tag.startswith("named_"):
            # a "__suffix" distinguishes several gather sites of ONE named
            # table (e.g. output_projection__pos / __neg in sampled softmax)
            table_key = scope + (tag[len("named_"):].split("__")[0],)
        else:
            dim = int(tag.split("_")[0][1:])
            table_key = scope + (f"{TABLE_PREFIX}{dim}{TABLE_SUFFIX}",)
        yield table_key, ids.reshape(-1), demb.reshape(-1, demb.shape[-1])
