"""Multi-host SPMD bootstrap.

The reference has no multi-process story (SURVEY §2.8).  For TPU pods:

1. every host calls :func:`initialize` (``jax.distributed.initialize`` — on
   TPU VMs the coordinator/process ids come from the metadata environment);
2. build the global mesh over ``jax.devices()`` (all hosts' devices);
3. feed each host its input shard (``host_batch_slice`` or
   ``ParquetIterableDataset.shard(process_count, process_index)``);
4. assemble per-host shards into one global array with
   :func:`global_batch_from_host`; jitted train steps then run SPMD with XLA
   collectives over ICI/DCN — identical trainer code to single-host.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Bring up the multi-host runtime (no-op if already initialized)."""
    import jax

    # NOTE: must not touch device APIs (jax.process_count/devices) before
    # jax.distributed.initialize — they'd initialize the local-only backend
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address, num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if kwargs:
            # explicit multi-host config that failed must not silently
            # degrade to single-host training
            raise RuntimeError(f"jax.distributed.initialize failed for coordinator {coordinator_address!r}: {e}") from e
        import warnings

        warnings.warn(f"jax.distributed.initialize unavailable ({e}); continuing single-process", RuntimeWarning, stacklevel=2)


def process_info():
    import jax

    return {"process_index": jax.process_index(), "process_count": jax.process_count(), "local_devices": len(jax.local_devices()), "global_devices": jax.device_count()}


def host_batch_slice(global_batch_size: int) -> slice:
    """This host's contiguous row range of a global batch."""
    import jax

    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_host(host_batch: Dict[str, np.ndarray], mesh, axis: str = "data"):
    """Assemble per-host arrays into one globally-sharded jax.Array.

    Each host passes its LOCAL shard; the result behaves as the concatenated
    global batch sharded over ``axis`` — feed it straight into a jitted step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        local_devs = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
        per_dev = x.shape[0] // max(len(local_devs), 1)
        arrays = [jax.device_put(x[i * per_dev:(i + 1) * per_dev], d) for i, d in enumerate(local_devs)]
        return jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)

    return jax.tree_util.tree_map(one, host_batch)


def global_batch_seed(base_seed: int, step: int) -> int:
    """Deterministic per-step seed identical on every host (global-batch shuffling)."""
    return (base_seed * 1000003 + step) % (2**31 - 1)
