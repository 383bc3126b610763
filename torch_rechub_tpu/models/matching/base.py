"""Two-tower model protocol helpers.

Matching models follow the reference "mode protocol"
(``torch_rechub/models/matching/dssm.py:38-72``): ``__call__(x)`` returns
training scores; ``mode="user"``/``"item"`` short-circuits to that tower's
embedding for inference.  In flax, ``mode`` is a call argument (modules are
frozen), and the extra ``towers`` method returns both embeddings for the
in-batch negative path.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch ``F.normalize(p=2)`` semantics."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
