"""Mixed-precision policy: bf16 compute, f32 parameters/accumulators.

The v5e MXU runs bfloat16 matmuls at ~2x the f32 FLOP rate and bf16 tensors
halve HBM traffic, so the production policy for every dense tower,
interaction block, attention kernel and large-vocab logits matmul is:

- **parameters stay float32** (optimizer moments, LayerNorm/BatchNorm scales,
  embedding tables by default) — full-precision master weights;
- **compute casts to bfloat16** at layer boundaries (flax's ``dtype=``
  convention: inputs and params are cast to the compute dtype, the MXU
  accumulates in f32 internally, outputs round to bf16);
- **reductions that are precision-sensitive stay float32**: losses,
  log-softmax/LSE accumulators, BatchNorm/LayerNorm statistics, AUC
  histograms, optimizer updates, and the Pallas kernels' accumulators
  (which were always ``preferred_element_type=f32``).

The policy is a *trace-time* global: layers consult :func:`compute_dtype`
inside ``__call__``, so whatever scope is active while jit traces a step is
baked into that executable.  Trainers wrap every ``model.init`` /
``model.apply`` trace in :func:`precision_scope`, keyed by their
``precision=`` argument — no model code changes, no recompilation of other
models, no global leakage across trainers in one process.

No reference counterpart: torch-rechub is f32-only (its trainers never touch
``torch.autocast``); this is a pure TPU-native (north-star) capability.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_COMPUTE = ["float32"]  # current policy (module-level, trace-time)

_ALIASES = {
    "bf16": "bfloat16",
    "bfloat16": "bfloat16",
    "mixed": "bfloat16",
    "f32": "float32",
    "fp32": "float32",
    "float32": "float32",
}


def _resolve(name) -> str:
    if name is None:
        return _COMPUTE[0]
    key = str(name).lower()
    if key not in _ALIASES:
        raise ValueError(f"precision must be one of {sorted(set(_ALIASES))}, got {name!r}")
    return _ALIASES[key]


def set_precision(name) -> str:
    """Set the process-wide compute precision; returns the previous value.

    Accepts ``"bf16"``/``"bfloat16"``/``"mixed"`` or ``"f32"``/``"float32"``.
    Prefer :func:`precision_scope` (or a trainer's ``precision=`` argument)
    over calling this directly.
    """
    old = _COMPUTE[0]
    _COMPUTE[0] = _resolve(name)
    return old


def precision() -> str:
    """The active compute precision: ``"float32"`` or ``"bfloat16"``."""
    return _COMPUTE[0]


def compute_dtype():
    """The active compute dtype as a jnp dtype (for flax ``dtype=`` args)."""
    return jnp.bfloat16 if _COMPUTE[0] == "bfloat16" else jnp.float32


def cast_compute(x):
    """Cast a float array to the compute dtype (ints/bools pass through)."""
    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != compute_dtype():
        return x.astype(compute_dtype())
    return x


@contextlib.contextmanager
def precision_scope(name):
    """Context manager form of :func:`set_precision`; ``None`` is a no-op."""
    if name is None:
        yield
        return
    old = set_precision(name)
    try:
        yield
    finally:
        _COMPUTE[0] = old
