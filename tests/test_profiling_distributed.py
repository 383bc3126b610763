"""Tests for profiling hooks and multi-host helpers (single-process semantics)."""

import numpy as np

from torch_rechub_tpu.parallel import create_mesh
from torch_rechub_tpu.parallel.distributed import global_batch_from_host, global_batch_seed, host_batch_slice, process_info
from torch_rechub_tpu.utils.profiling import StepTimer, device_memory_stats


def test_step_timer():
    t = StepTimer(examples_per_step=128)
    for _ in range(5):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["steps"] == 5
    assert s["examples_per_s"] > 0
    assert s["p99_s"] >= s["p50_s"]


def test_process_info_single():
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 8  # virtual CPU mesh


def test_host_batch_slice():
    assert host_batch_slice(256) == slice(0, 256)


def test_global_batch_from_host_sharded():
    mesh = create_mesh(data=8, model=1)
    batch = {"a": np.arange(64, dtype=np.float32).reshape(64, 1)}
    out = global_batch_from_host(batch, mesh)
    assert out["a"].shape == (64, 1)
    assert not out["a"].sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out["a"]).ravel(), np.arange(64))


def test_global_batch_seed_deterministic():
    assert global_batch_seed(7, 3) == global_batch_seed(7, 3)
    assert global_batch_seed(7, 3) != global_batch_seed(7, 4)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) >= 1
