"""Streaming Parquet input pipeline.

Parity with ``torch_rechub/data/dataset.py:17-107`` (ParquetIterableDataset:
contiguous file partitioning per worker, lazy scanning, dict-of-array
batches), upgraded for SPMD: ``shard(num_shards, index)`` partitions files
across hosts, and ``prefetch_to_device`` double-buffers batches onto the
accelerator so input never blocks the train step.
"""

from __future__ import annotations

import collections
import glob as globlib
import itertools
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .convert import pa_array_to_numpy


class ParquetIterableDataset:
    """Iterate dict-of-numpy batches from (many) parquet files.

    Args:
        file_paths: list of paths or a glob pattern.
        batch_size: rows per yielded batch.
        columns: columns to read (None = all).
        label_col: if set, batches are ``(x_dict, y)`` tuples.
        dtype_map: optional per-column numpy dtype overrides.
    """

    def __init__(self, file_paths, batch_size: int = 1024, columns: Optional[Sequence[str]] = None, label_col: Optional[str] = None, dtype_map: Optional[Dict] = None):
        if isinstance(file_paths, str):
            file_paths = sorted(globlib.glob(file_paths))
        self.file_paths: List[str] = list(file_paths)
        if not self.file_paths:
            raise ValueError("no parquet files matched")
        self.batch_size = batch_size
        self.columns = list(columns) if columns is not None else None
        self.label_col = label_col
        self.dtype_map = dtype_map or {}
        self._shard = (1, 0)

    def shard(self, num_shards: int, index: int) -> "ParquetIterableDataset":
        """Contiguous file partition for worker/host ``index`` of ``num_shards``."""
        if not (0 <= index < num_shards):
            raise ValueError(f"index {index} out of range for {num_shards} shards")
        out = ParquetIterableDataset(self.file_paths, self.batch_size, self.columns, self.label_col, self.dtype_map)
        out._shard = (num_shards, index)
        return out

    def _my_files(self) -> List[str]:
        n, i = self._shard
        per = (len(self.file_paths) + n - 1) // n
        return self.file_paths[i * per:(i + 1) * per]

    def _convert(self, table):
        out = {}
        for name in table.column_names:
            arr = pa_array_to_numpy(table.column(name), dtype=self.dtype_map.get(name, np.float32))
            out[name] = arr
        return out

    def __iter__(self) -> Iterator:
        import pyarrow.parquet as pq

        buffer: Dict[str, List[np.ndarray]] = collections.defaultdict(list)
        buffered = 0

        def flush(n):
            nonlocal buffered
            batch = {k: np.concatenate(v)[:n] for k, v in buffer.items()}
            rest = {k: np.concatenate(v)[n:] for k, v in buffer.items()}
            buffer.clear()
            for k, v in rest.items():
                if len(v):
                    buffer[k].append(v)
            buffered = len(next(iter(rest.values()))) if rest else 0
            if self.label_col is not None:
                y = batch.pop(self.label_col)
                return batch, y
            return batch

        for path in self._my_files():
            pf = pq.ParquetFile(path)
            for record_batch in pf.iter_batches(batch_size=self.batch_size, columns=self.columns):
                import pyarrow as pa

                table = pa.Table.from_batches([record_batch])
                arrs = self._convert(table)
                n_rows = len(next(iter(arrs.values())))
                for k, v in arrs.items():
                    buffer[k].append(v)
                buffered += n_rows
                while buffered >= self.batch_size:
                    yield flush(self.batch_size)
        if buffered > 0:
            yield flush(buffered)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Move batches onto the accelerator ``size`` steps ahead of consumption."""
    import jax

    queue = collections.deque()

    def put(batch):
        queue.append(jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch))

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        put(batch)
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            put(batch)
