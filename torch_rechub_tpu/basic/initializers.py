"""Embedding-table initializer specs.

Parity with the reference initializer set
(``torch_rechub/basic/initializers.py:4-100``): RandomNormal, RandomUniform,
XavierNormal, XavierUniform, Pretrained.  The reference initializers *build*
``nn.Embedding`` modules; here they are pure specs that produce a JAX init
function ``(key, (vocab, dim)) -> jnp.ndarray`` — variable creation belongs to
``EmbeddingCollection``.  When the owning feature declares ``padding_idx``,
the collection zeroes that row after init.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Initializer:
    """Base initializer spec; subclasses implement ``init(key, shape)``."""

    def init(self, key: jax.Array, shape) -> jax.Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
        return self.init(key, shape).astype(dtype)


@dataclasses.dataclass(frozen=True)
class RandomNormal(Initializer):
    mean: float = 0.0
    std: float = 1e-4

    def init(self, key, shape):
        return self.mean + self.std * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class RandomUniform(Initializer):
    minval: float = 0.0
    maxval: float = 1.0

    def init(self, key, shape):
        return jax.random.uniform(key, shape, minval=self.minval, maxval=self.maxval)


@dataclasses.dataclass(frozen=True)
class XavierNormal(Initializer):
    gain: float = 1.0

    def init(self, key, shape):
        fan_in, fan_out = shape[-2], shape[-1]
        std = self.gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class XavierUniform(Initializer):
    gain: float = 1.0

    def init(self, key, shape):
        fan_in, fan_out = shape[-2], shape[-1]
        bound = self.gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


@dataclasses.dataclass(frozen=True, eq=False)
class Pretrained(Initializer):
    """Initialize from a host array; ``freeze`` marks the table as non-trainable.

    Freezing is honoured by the trainers via an optax ``masked`` transform over
    parameter paths (reference semantics: ``nn.Embedding.from_pretrained``
    with ``freeze=True``).
    """

    weights: Any = None  # np.ndarray-like (vocab, dim)
    freeze: bool = True

    def init(self, key, shape):
        w = jnp.asarray(np.asarray(self.weights), dtype=jnp.float32)
        if tuple(w.shape) != tuple(shape):
            raise ValueError(f"Pretrained weights shape {w.shape} != requested {tuple(shape)}")
        return w
