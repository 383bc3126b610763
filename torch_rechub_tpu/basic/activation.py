"""Activation functions and the activation factory.

Parity with ``torch_rechub/basic/activation.py:5-54``: sigmoid, relu, dice,
prelu, softmax, leakyrelu.  Parametric activations (Dice, PReLU) are flax
modules; the rest are plain functions.  ``activation_layer(name)`` returns a
callable usable inside any model.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Dice(nn.Module):
    """Dice activation from the DIN paper (arXiv:1706.06978).

    Matches the reference semantics (``activation.py:5-25``): per-row mean /
    (sum of squared deviations + eps) normalization, sigmoid gate ``p``, output
    ``p*x + (1-p)*alpha*x`` with a single learnable scalar ``alpha``.
    """

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", jax.nn.initializers.normal(1.0), (1,))
        # normalize over the FEATURE axis (the reference flattens to (N, C)
        # and uses dim=1; axis=-1 generalizes that to 3-D inputs like DIN's
        # (B, L, C) attention features).  Statistics in f32 regardless of the
        # compute precision (mean/variance are cancellation-sensitive).
        x32 = x.astype(jnp.float32)
        avg = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.sum((x32 - avg) ** 2 + self.epsilon, axis=-1, keepdims=True)
        ps = jax.nn.sigmoid((x32 - avg) / jnp.sqrt(var))
        return (ps * x32 + (1.0 - ps) * alpha * x32).astype(x.dtype)


class PReLU(nn.Module):
    """PReLU with a single shared learnable slope (torch ``nn.PReLU`` default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.constant(self.init_slope), (1,))
        return jnp.where(x >= 0, x, slope * x)


def activation_layer(act_name):
    """Return an activation callable by name (or pass a callable through).

    Supported names mirror the reference factory (``activation.py:28-54``):
    ``sigmoid | relu | dice | prelu | softmax | leakyrelu``.  ``dice`` and
    ``prelu`` return parametric flax modules (must be called inside a parent
    module); others return pure functions.
    """
    if callable(act_name) and not isinstance(act_name, str):
        return act_name
    name = act_name.lower()
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "relu":
        return jax.nn.relu
    if name == "dice":
        return Dice()
    if name == "prelu":
        return PReLU()
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=1)
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    raise NotImplementedError(f"unsupported activation: {act_name!r}")
