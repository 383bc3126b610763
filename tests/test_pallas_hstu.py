"""Parity tests for the fused HSTU attention op (XLA fallback path on CPU).

The pallas TPU path is exercised by bench/verify runs on the real chip; these
tests pin the op's numerics (forward + custom-VJP backward) against the dense
reference on any backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torch_rechub_tpu.ops.pallas.hstu_attention import _xla_reference, hstu_attention

B, H, L, D = 2, 2, 32, 8


def inputs(seed=0, with_pad=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(B, H, L, L)).astype(np.float32) * 0.1)
    mask = np.ones((B, L), dtype=bool)
    if with_pad:
        mask[0, L // 2:] = False
    return q, k, v, bias, jnp.asarray(mask)


def test_forward_matches_reference():
    q, k, v, bias, mask = inputs()
    out = hstu_attention(q, k, v, bias, mask, 0.35, 64.0)
    ref = _xla_reference(q, k, v, bias, mask, 0.35, 64.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_backward_matches_reference():
    q, k, v, bias, mask = inputs()

    def f_fused(q, k, v, bias):
        return jnp.sum(hstu_attention(q, k, v, bias, mask, 0.35, 64.0) ** 2)

    def f_ref(q, k, v, bias):
        return jnp.sum(_xla_reference(q, k, v, bias, mask, 0.35, 64.0) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_broadcast_bias_grad_shape():
    q, k, v, _, mask = inputs()
    bias = jnp.zeros((1, H, L, L))

    def f(bias):
        return jnp.sum(hstu_attention(q, k, v, bias, mask, 0.35, 64.0))

    g = jax.grad(f)(bias)
    assert g.shape == (1, H, L, L)
