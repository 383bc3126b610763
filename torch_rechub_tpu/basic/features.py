"""Declarative feature schema for the TPU-native rechub.

Pure-data feature specs (no side effects, no parameter ownership): the schema
drives :class:`~torch_rechub_tpu.ops.embedding.EmbeddingCollection`, which owns
all embedding variables.  Capability parity with the reference schema
(``torch_rechub/basic/features.py:5-87``): vocab size, embed dim with the
``floor(6 * V**0.25)`` auto rule, ``shared_with`` table sharing, ``padding_idx``
masking, pooling mode for sequence features, and a pluggable initializer.

Unlike the reference, these are frozen dataclasses: hashable, usable as static
args under ``jax.jit``, and they never lazily cache an embedding module
(the reference's ``get_embedding_layer`` memoization is a footgun we drop).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union

from .initializers import Initializer, RandomNormal


def auto_embedding_dim(vocab_size: int) -> int:
    """Default embedding dim ``floor(6 * vocab_size**0.25)``.

    Same rule as the reference (``torch_rechub/utils/data.py:86-101``), from
    the "Deep & Cross Network for Ad Click Predictions" heuristic.
    """
    return int(math.floor(6 * vocab_size**0.25))


@dataclasses.dataclass(frozen=True)
class DenseFeature:
    """A numeric feature passed through as-is.

    ``embed_dim`` is the width of the incoming value: 1 for a scalar column,
    >1 when the input is a pre-computed vector.
    """

    name: str
    embed_dim: int = 1

    def __repr__(self) -> str:
        return f"<DenseFeature {self.name}>"


@dataclasses.dataclass(frozen=True)
class SparseFeature:
    """A categorical id feature backed by an embedding table.

    Args:
        name: feature (and input-dict key) name.
        vocab_size: number of rows of the embedding table.
        embed_dim: embedding width; ``None`` selects ``auto_embedding_dim``.
        shared_with: name of another feature whose table this feature reuses.
        padding_idx: row treated as padding — initialized to zeros and masked
            out by ``InputMask`` semantics.
        initializer: initializer spec for the table.
    """

    name: str
    vocab_size: int
    embed_dim: Optional[int] = None
    shared_with: Optional[str] = None
    padding_idx: Optional[int] = None
    initializer: Initializer = dataclasses.field(default_factory=lambda: RandomNormal(0.0, 1e-4))

    def __post_init__(self):
        if self.embed_dim is None:
            object.__setattr__(self, "embed_dim", auto_embedding_dim(self.vocab_size))

    def __repr__(self) -> str:
        return f"<SparseFeature {self.name} with Embedding shape ({self.vocab_size}, {self.embed_dim})>"


@dataclasses.dataclass(frozen=True)
class SequenceFeature:
    """A padded id-sequence (or multi-hot) feature backed by an embedding table.

    ``pooling`` is one of ``"mean" | "sum" | "concat"``; mean/sum are
    mask-aware (positions equal to ``padding_idx``, or ``-1`` when no padding
    idx is declared, are excluded), ``concat`` keeps the ``(B, L, D)`` shape.
    """

    name: str
    vocab_size: int
    embed_dim: Optional[int] = None
    pooling: str = "mean"
    shared_with: Optional[str] = None
    padding_idx: Optional[int] = None
    initializer: Initializer = dataclasses.field(default_factory=lambda: RandomNormal(0.0, 1e-4))

    def __post_init__(self):
        if self.embed_dim is None:
            object.__setattr__(self, "embed_dim", auto_embedding_dim(self.vocab_size))
        if self.pooling not in ("mean", "sum", "concat"):
            raise ValueError(f"pooling must be one of mean/sum/concat, got {self.pooling!r}")

    def __repr__(self) -> str:
        return f"<SequenceFeature {self.name} with Embedding shape ({self.vocab_size}, {self.embed_dim})>"


Feature = Union[DenseFeature, SparseFeature, SequenceFeature]


def table_name(feature: Feature) -> str:
    """Resolve the embedding-table owner for a feature (``shared_with`` aware)."""
    shared = getattr(feature, "shared_with", None)
    return shared if shared is not None else feature.name


def embedded_features(features) -> Tuple[Feature, ...]:
    """Features that own or reference an embedding table (sparse + sequence)."""
    return tuple(f for f in features if isinstance(f, (SparseFeature, SequenceFeature)))


def dense_features(features) -> Tuple[DenseFeature, ...]:
    return tuple(f for f in features if isinstance(f, DenseFeature))
