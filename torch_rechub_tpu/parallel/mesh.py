"""Device mesh + sharding rules — the framework's distributed substrate.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``torch_rechub/trainers/ctr_trainer.py:53-55``).  Here parallelism is
TPU-native SPMD: one ``jax.sharding.Mesh`` with ``("data", "model")`` axes;
batches are sharded over ``data``, embedding tables are row-sharded over
``model``, dense parameters are replicated.  XLA inserts the collectives
(psum for DP grad reduction, all-to-all style gathers for the row-sharded
tables) over ICI.

Everything degrades gracefully: with ``mesh=None`` (or a 1-device mesh) all
helpers return ``None``/fully-replicated shardings, so the same trainer code
runs single-chip, on an 8-device CPU test mesh, or on a pod slice.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How many mesh slots per axis; ``data * model`` must equal device count."""

    data: int
    model: int = 1


def create_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Optional[Mesh]):
    """Sharding for a per-step batch: leading (batch) dim over the data axis."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(DATA_AXIS))


def scan_batch_sharding(mesh: Optional[Mesh]):
    """Sharding for stacked multi-step batches ``(n_steps, batch, ...)``:
    the scan axis replicates, the batch axis shards over data."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Table placement policy — ONE budget-aware function (round-4 unification of
# the former three independent knobs: the embedding fuse threshold, the
# divisibility check, and the 8*n_model floor).
# ---------------------------------------------------------------------------

# Tables at least this many rows row-shard over the model axis whenever
# n_model > 1: at >=64k rows random-gather latency dominates either way
# (docs/EMBEDDING.md), so splitting HBM across chips is free capacity.
# EmbeddingCollection pads tables >= this size to a multiple of 64 rows, so
# divisibility holds for any model axis that divides 64 (powers of two up to
# 64); a non-power-of-two axis (3, 6, ...) need not divide a 64-multiple and
# such tables fall back to replicate with a warning naming them.
SHARD_MIN_ROWS = 65536

# Replicated-table HBM budget per chip.  When the tables chosen to replicate
# exceed this, the policy force-shards the largest divisible ones until the
# remainder fits (v5e has 16 GiB HBM; 2 GiB leaves room for activations,
# optimizer state and XLA scratch).
DEFAULT_TABLE_HBM_BUDGET = 2 << 30


def plan_table_placement(table_shapes, n_model: int, hbm_budget_bytes: int = DEFAULT_TABLE_HBM_BUDGET, dtype_bytes: int = 4, shard_min_rows: Optional[int] = None, force_shard=()):
    """Decide shard-vs-replicate for every embedding table, budget-aware.

    Args:
        table_shapes: ``{name: (rows, dim)}`` for every embedding table.
        n_model: size of the model mesh axis.
        hbm_budget_bytes: per-chip budget for REPLICATED table bytes.
        dtype_bytes: bytes per element (4 = f32 tables).
        shard_min_rows: rows at which a table always shards (n_model > 1).
        force_shard: names that shard regardless of size (fused tables — they
            exist to be sharded and are padded divisible by construction).

    Returns:
        ``{name: "shard" | "replicate"}``.  Rules, in order:
        1. ``n_model == 1`` → everything replicates (nothing to shard over).
        2. ``force_shard`` members and tables with rows >= shard_min_rows,
           rows divisible by n_model → shard.
        3. Remaining tables replicate — unless their total exceeds the HBM
           budget, in which case the largest divisible ones shard (floor:
           8 * n_model rows) until the remainder fits.
        A table that must stay replicated only because its rows don't divide
        ``n_model`` triggers a warning naming it (no more silent partiality);
        ``EmbeddingCollection`` avoids this by padding big tables to a
        multiple of 64 rows.
    """
    if shard_min_rows is None:
        shard_min_rows = SHARD_MIN_ROWS  # late-bound: module attr, patchable
    if n_model <= 1:
        return {name: "replicate" for name in table_shapes}
    plan = {}
    replicated = []
    force = set(force_shard)
    for name, (rows, dim) in table_shapes.items():
        if (name in force or rows >= shard_min_rows) and rows % n_model == 0 and rows >= n_model:
            plan[name] = "shard"
        else:
            if rows >= shard_min_rows or name in force:
                import warnings

                warnings.warn(f"table {name!r} ({rows} rows) stays replicated: rows not divisible by model axis {n_model} — pad to a multiple of {n_model} (EmbeddingCollection pads tables >= {shard_min_rows} rows automatically)")
            plan[name] = "replicate"
            replicated.append((rows * dim * dtype_bytes, rows, name))
    # budget pass: force-shard the largest replicated-but-divisible tables
    over = sum(b for b, _, _ in replicated) - hbm_budget_bytes
    if over > 0:
        for bytes_, rows, name in sorted(replicated, reverse=True):
            if over <= 0:
                break
            if rows % n_model == 0 and rows >= 8 * n_model:
                plan[name] = "shard"
                over -= bytes_ * (n_model - 1) // n_model
    return plan


def table_partition_spec(vocab_size: int, mesh: Optional[Mesh]) -> P:
    """Single-table convenience wrapper over :func:`plan_table_placement`."""
    if mesh is None:
        return P()
    plan = plan_table_placement({"t": (vocab_size, 1)}, mesh.shape[MODEL_AXIS], dtype_bytes=4)
    return P(MODEL_AXIS, None) if plan["t"] == "shard" else P()


def _is_table_path(path_str: str) -> bool:
    """Embedding-table params by path contract: EmbeddingCollection names every
    table ``*_table``, model-local embeddings carry ``embedding`` in their
    module path (e.g. HSTU's ``token_embedding``), and untied generative
    output projections (``output_projection``) are vocab-row tables too —
    the sampled-softmax sparse path updates them row-wise."""
    p = path_str.lower()
    return "embedding" in p or p.endswith("_table']") or "output_projection']" in p


def param_shardings(params, mesh: Optional[Mesh], hbm_budget_bytes: int = DEFAULT_TABLE_HBM_BUDGET):
    """A pytree of NamedShardings: tables placed by :func:`plan_table_placement`
    (row-sharded over ``model`` or replicated), everything else replicated."""
    if mesh is None:
        return jax.tree_util.tree_map(lambda _: None, params)
    n_model = mesh.shape[MODEL_AXIS]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    table_shapes = {jax.tree_util.keystr(p): tuple(leaf.shape) for p, leaf in flat if _is_table_path(jax.tree_util.keystr(p)) and leaf.ndim == 2}
    # fused tables always shard — padded divisible by construction, and the
    # fused layout exists precisely to row-shard / take sparse updates
    force = tuple(k for k in table_shapes if "fused_d" in k and k.endswith("_table']"))
    plan = plan_table_placement(table_shapes, n_model, hbm_budget_bytes=hbm_budget_bytes, force_shard=force)

    def one(path, leaf):
        key = jax.tree_util.keystr(path)
        if plan.get(key) == "shard":
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Optional[Mesh]):
    """Place a parameter pytree on the mesh according to the standard rules."""
    if mesh is None:
        return params
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Optional[Mesh]):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    if mesh is None:
        return batch
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
