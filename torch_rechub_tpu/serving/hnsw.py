"""Native HNSW backend — in-repo C++ index bound through ctypes.

Always-available ANN backend (the reference's annoy/faiss/milvus are pip
dependencies; this one compiles ``native/hnsw.cpp`` on first use with g++ and
caches the shared object next to the source).  Metrics: ``"ip"`` (dot,
descending), ``"l2"`` (ascending), ``"angular"`` (cosine distance semantics
via normalized dot).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from .base import BaseBuilder, BaseIndexer, simple_context

_METRICS = {"ip": 0, "l2": 1, "angular": 2, "dot": 0, "euclidean": 1}
_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        here = os.path.join(os.path.dirname(__file__), "native")
        so = os.path.join(here, "libhnsw.so")
        src = os.path.join(here, "hnsw.cpp")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so], check=True)
        lib = ctypes.CDLL(so)
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint]
        lib.hnsw_add.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.hnsw_search.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float)]
        lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.hnsw_save.restype = ctypes.c_int
        lib.hnsw_load.argtypes = [ctypes.c_char_p]
        lib.hnsw_load.restype = ctypes.c_void_p
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.restype = ctypes.c_int
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class HnswIndexer(BaseIndexer):
    def __init__(self, handle, metric: str, ef_search: int):
        self._lib = _load_lib()
        self._handle = handle
        self.metric = metric
        self.ef_search = ef_search

    def query(self, embeddings, top_k: int):
        q = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
        if q.ndim == 1:
            q = q[None]
        n = q.shape[0]
        ids = np.empty((n, top_k), dtype=np.int32)
        dists = np.empty((n, top_k), dtype=np.float32)
        self._lib.hnsw_search(
            self._handle,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            top_k,
            max(self.ef_search, top_k),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if self.metric in ("ip", "dot", "angular"):
            dists = -dists  # internal "distance" is -dot; report similarity
        return ids.astype(np.int64), dists

    def save(self, file_path) -> None:
        if not self._lib.hnsw_save(self._handle, str(file_path).encode()):
            raise IOError(f"failed to save index to {file_path}")

    def close(self):
        if self._handle:
            self._lib.hnsw_free(self._handle)
            self._handle = None

    @property
    def size(self) -> int:
        return self._lib.hnsw_size(self._handle)


class HnswBuilder(BaseBuilder):
    """Native HNSW builder: ``metric`` ip|l2|angular, ``M``, ``ef_construction``, ``ef_search``."""

    def __init__(self, metric: str = "ip", M: int = 16, ef_construction: int = 200, ef_search: int = 64, seed: int = 0):
        if metric not in _METRICS:
            raise ValueError(f"metric must be one of {sorted(_METRICS)}, got {metric!r}")
        self.metric = metric
        self.M = M
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self.seed = seed

    def from_embeddings(self, embeddings):
        lib = _load_lib()
        emb = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
        handle = lib.hnsw_create(emb.shape[1], _METRICS[self.metric], self.M, self.ef_construction, self.seed)
        lib.hnsw_add(handle, emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), emb.shape[0])
        return simple_context(HnswIndexer(handle, self.metric, self.ef_search))

    def from_index_file(self, index_file):
        lib = _load_lib()
        handle = lib.hnsw_load(str(index_file).encode())
        if not handle:
            raise IOError(f"failed to load index from {index_file}")
        return simple_context(HnswIndexer(handle, self.metric, self.ef_search))
