"""Annoy backend (lazy import; parity with ``torch_rechub/serving/annoy.py:30-133``)."""

from __future__ import annotations

import numpy as np

from .base import BaseBuilder, BaseIndexer, simple_context


class AnnoyIndexer(BaseIndexer):
    def __init__(self, index, search_k: int = -1):
        self._index = index
        self.search_k = search_k

    def query(self, embeddings, top_k: int):
        q = np.asarray(embeddings, dtype=np.float32)
        if q.ndim == 1:
            q = q[None]
        ids = np.empty((len(q), top_k), dtype=np.int64)
        dists = np.empty((len(q), top_k), dtype=np.float32)
        for i, row in enumerate(q):  # annoy queries one vector at a time
            idx, d = self._index.get_nns_by_vector(row.tolist(), top_k, search_k=self.search_k, include_distances=True)
            idx = list(idx) + [-1] * (top_k - len(idx))
            d = list(d) + [0.0] * (top_k - len(d))
            ids[i], dists[i] = idx, d
        return ids, dists

    def save(self, file_path) -> None:
        self._index.save(str(file_path))


class AnnoyBuilder(BaseBuilder):
    """metric: angular | euclidean | dot; n_trees; search_k."""

    def __init__(self, metric: str = "angular", n_trees: int = 10, search_k: int = -1, dim: int = None):
        if metric not in ("angular", "euclidean", "dot", "manhattan", "hamming"):
            raise ValueError(f"unsupported annoy metric {metric!r}")
        self.metric = metric
        self.n_trees = n_trees
        self.search_k = search_k
        self.dim = dim

    def _make(self, dim):
        from annoy import AnnoyIndex  # lazy; optional dependency

        return AnnoyIndex(dim, self.metric)

    def from_embeddings(self, embeddings):
        emb = np.asarray(embeddings, dtype=np.float32)
        index = self._make(emb.shape[1])
        for i, row in enumerate(emb):
            index.add_item(i, row.tolist())
        index.build(self.n_trees)
        return simple_context(AnnoyIndexer(index, self.search_k))

    def from_index_file(self, index_file):
        if self.dim is None:
            raise ValueError("dim is required to load an annoy index")
        index = self._make(self.dim)
        index.load(str(index_file))
        return simple_context(AnnoyIndexer(index, self.search_k))
