"""Base abstraction for vector indexers used in the retrieval stage.

API parity with ``torch_rechub/serving/base.py:11-107``: a ``BaseBuilder``
owns build-time config and yields a ``BaseIndexer`` through context-managed
``from_embeddings`` / ``from_index_file``; indexers expose
``query(embeddings, top_k) -> (ids, distances)`` and ``save(path)``.
Arrays are numpy (device-agnostic host side).
"""

from __future__ import annotations

import abc
import contextlib
from typing import ContextManager, Tuple

import numpy as np


class BaseIndexer(abc.ABC):
    @abc.abstractmethod
    def query(self, embeddings: np.ndarray, top_k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(ids, distances)`` each of shape ``(n, top_k)``."""

    @abc.abstractmethod
    def save(self, file_path) -> None:
        """Persist the index to disk."""


class BaseBuilder(abc.ABC):
    @abc.abstractmethod
    def from_embeddings(self, embeddings: np.ndarray) -> ContextManager[BaseIndexer]:
        """Build an index from an ``(n, d)`` embedding matrix."""

    @abc.abstractmethod
    def from_index_file(self, index_file) -> ContextManager[BaseIndexer]:
        """Load a previously saved index."""


@contextlib.contextmanager
def simple_context(indexer: BaseIndexer):
    """Default no-op lifecycle for in-process indexers."""
    try:
        yield indexer
    finally:
        close = getattr(indexer, "close", None)
        if close is not None:
            close()
