"""FAISS backend (lazy import; parity with ``torch_rechub/serving/faiss.py:32-154``).

``index_key`` follows the faiss ``index_factory`` DSL — ``"Flat"``,
``"HNSW{m}"``, ``"IVF{nlists},Flat"`` — with IP or L2 metric and optional
``efSearch``/``nprobe`` search-time knobs.
"""

from __future__ import annotations

import numpy as np

from .base import BaseBuilder, BaseIndexer, simple_context


class FaissIndexer(BaseIndexer):
    def __init__(self, index, ef_search=None, nprobe=None):
        import faiss  # lazy; optional dependency

        self._faiss = faiss
        self._index = index
        if ef_search is not None and hasattr(index, "hnsw"):
            index.hnsw.efSearch = ef_search
        if nprobe is not None and hasattr(index, "nprobe"):
            index.nprobe = nprobe

    def query(self, embeddings, top_k: int):
        q = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
        if q.ndim == 1:
            q = q[None]
        dists, ids = self._index.search(q, top_k)
        return ids.astype(np.int64), dists

    def save(self, file_path) -> None:
        self._faiss.write_index(self._index, str(file_path))


class FaissBuilder(BaseBuilder):
    def __init__(self, index_key: str = "Flat", metric: str = "ip", ef_search=None, nprobe=None):
        self.index_key = index_key
        if metric not in ("ip", "l2"):
            raise ValueError(f"unsupported faiss metric {metric!r}")
        self.metric = metric
        self.ef_search = ef_search
        self.nprobe = nprobe

    def from_embeddings(self, embeddings):
        import faiss  # lazy; optional dependency

        emb = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
        m = faiss.METRIC_INNER_PRODUCT if self.metric == "ip" else faiss.METRIC_L2
        index = faiss.index_factory(emb.shape[1], self.index_key, m)
        if not index.is_trained:
            index.train(emb)
        index.add(emb)
        return simple_context(FaissIndexer(index, self.ef_search, self.nprobe))

    def from_index_file(self, index_file):
        import faiss  # lazy; optional dependency

        index = faiss.read_index(str(index_file))
        return simple_context(FaissIndexer(index, self.ef_search, self.nprobe))
