"""Parquet streaming tests: conversion matrix, batching, sharding, prefetch."""

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from torch_rechub_tpu.data import ParquetIterableDataset, pa_array_to_numpy, prefetch_to_device  # noqa: E402


def write_files(tmp_path, n_files=3, rows=100):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        table = pa.table({
            "user_id": rng.integers(0, 50, rows),
            "item_id": rng.integers(0, 99, rows),
            "price": rng.normal(size=rows),
            "label": rng.integers(0, 2, rows),
        })
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(table, p)
        paths.append(p)
    return paths


def test_pa_array_conversions():
    assert pa_array_to_numpy(pa.array([1, 2, 3]), np.int64).tolist() == [1, 2, 3]
    fixed = pa.array([[1.0, 2.0], [3.0, 4.0]])
    out = pa_array_to_numpy(fixed)
    assert out.shape == (2, 2)
    ragged = pa.array([[1.0], [2.0, 3.0]])
    with pytest.raises(ValueError):
        pa_array_to_numpy(ragged)


def test_batching_and_labels(tmp_path):
    paths = write_files(tmp_path, n_files=2, rows=100)
    ds = ParquetIterableDataset(paths, batch_size=64, label_col="label", dtype_map={"user_id": np.int32, "item_id": np.int32, "label": np.float32})
    total = 0
    for x, y in ds:
        assert set(x.keys()) == {"user_id", "item_id", "price"}
        assert x["user_id"].dtype == np.int32
        assert len(y) == len(x["user_id"])
        total += len(y)
    assert total == 200


def test_glob_and_shard(tmp_path):
    write_files(tmp_path, n_files=4, rows=50)
    ds = ParquetIterableDataset(str(tmp_path / "*.parquet"), batch_size=32)
    counts = []
    for shard_i in range(2):
        shard = ds.shard(2, shard_i)
        counts.append(sum(len(next(iter(b.values()))) for b in shard))
    assert sum(counts) == 200
    assert counts[0] == counts[1] == 100  # contiguous file split


def test_prefetch_to_device(tmp_path):
    write_files(tmp_path, n_files=1, rows=64)
    ds = ParquetIterableDataset(str(tmp_path / "*.parquet"), batch_size=16)
    batches = list(prefetch_to_device(ds, size=2))
    assert len(batches) == 4
    import jax

    assert isinstance(jax.tree_util.tree_leaves(batches[0])[0], jax.Array)
