"""Exact brute-force backend under the BaseBuilder/BaseIndexer ABC.

The TPU-native default: a batched matmul + top-k on whatever accelerator JAX
provides (exact results; see ``retrieval.py`` for the sharded variant).  Also
serves as the reference oracle for the ANN backends' recall tests.
"""

from __future__ import annotations

import numpy as np

from .base import BaseBuilder, BaseIndexer, simple_context
from .retrieval import brute_force_topk


class BruteForceIndexer(BaseIndexer):
    def __init__(self, embeddings: np.ndarray, metric: str = "ip", mesh=None):
        self.embeddings = np.asarray(embeddings, dtype=np.float32)
        self.metric = metric
        self.mesh = mesh

    def _prepare(self, q):
        q = np.asarray(q, dtype=np.float32)
        return q[None] if q.ndim == 1 else q

    def query(self, embeddings, top_k: int):
        q = self._prepare(embeddings)
        items = self.embeddings
        if self.metric == "angular":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            items = items / np.maximum(np.linalg.norm(items, axis=1, keepdims=True), 1e-12)
        if self.metric == "l2":
            # argmin |q-i|^2 == argmax (q.i - 0.5|i|^2): augment with a bias column
            item_norms = np.sum(items**2, axis=1)
            items_aug = np.concatenate([items, -0.5 * item_norms[:, None]], axis=1)
            q_aug = np.concatenate([q, np.ones((len(q), 1), np.float32)], axis=1)
            idx, scores = brute_force_topk(q_aug, items_aug, top_k, mesh=self.mesh)
            d2 = np.sum(q**2, axis=1, keepdims=True) - 2 * scores
            return idx.astype(np.int64), d2
        idx, scores = brute_force_topk(q, items, top_k, mesh=self.mesh)
        return idx.astype(np.int64), scores

    def save(self, file_path) -> None:
        np.save(str(file_path), self.embeddings)


class BruteForceBuilder(BaseBuilder):
    def __init__(self, metric: str = "ip", mesh=None):
        if metric not in ("ip", "l2", "angular", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")
        self.metric = "ip" if metric == "dot" else metric
        self.mesh = mesh

    def from_embeddings(self, embeddings):
        return simple_context(BruteForceIndexer(embeddings, self.metric, self.mesh))

    def from_index_file(self, index_file):
        path = str(index_file)
        if not path.endswith(".npy"):
            path = path + ".npy"
        return simple_context(BruteForceIndexer(np.load(path), self.metric, self.mesh))
