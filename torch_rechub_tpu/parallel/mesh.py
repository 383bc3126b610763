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


def table_partition_spec(vocab_size: int, mesh: Optional[Mesh]) -> P:
    """Row-shard an embedding table over the model axis when rows divide evenly.

    Small/indivisible tables stay replicated — sharding a 17-row vocab across
    chips costs more in gather latency than it saves in HBM.
    """
    if mesh is None:
        return P()
    n_model = mesh.shape[MODEL_AXIS]
    if n_model > 1 and vocab_size % n_model == 0 and vocab_size >= 8 * n_model:
        return P(MODEL_AXIS, None)
    return P()


def _is_table_path(path_str: str) -> bool:
    return "embedding" in path_str.lower() or path_str.lower().endswith("_table']")


def param_shardings(params, mesh: Optional[Mesh]):
    """A pytree of NamedShardings: tables row-sharded, everything else replicated."""
    if mesh is None:
        return jax.tree_util.tree_map(lambda _: None, params)

    def one(path, leaf):
        path_str = jax.tree_util.keystr(path)
        if _is_table_path(path_str) and leaf.ndim == 2:
            return NamedSharding(mesh, table_partition_spec(leaf.shape[0], mesh))
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
