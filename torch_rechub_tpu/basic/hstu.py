"""HSTU sequential-transduction layers (Eq. 2-4 of "Actions Speak Louder
than Words", arXiv:2402.17152).

Parity with ``torch_rechub/basic/layers.py:792-970``:

- Eq.2: one SiLU on the joint UVQK projection before the split.
- Eq.3: ``silu(Q K^T * alpha + rab^{p,t}) / max_seq_len`` attention — no
  softmax normalizer — with causal + key-padding masking at -1e4.
- Eq.4: ``f_2(LayerNorm(A V) * U)``; external residual in ``HSTUBlock``.

TPU note: the silu attention has no row normalizer, so a blockwise Pallas
kernel (running sum of ``silu(scores)·V`` per block with on-the-fly rab) is a
drop-in replacement for the XLA einsum path here — see ``ops/pallas``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.hstu_utils import RelativeBucketedTimeAndPositionBias
from .layers import torch_linear_init
from .precision import compute_dtype


class HSTULayer(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    dqk: int = 64
    dv: int = 64
    dropout: float = 0.1
    max_seq_len: int = 200
    num_time_buckets: int = 128
    time_bucket_fn: str = "sqrt"
    time_bucket_divisor: float = 1.0
    time_bucket_unit: str = "minutes"
    use_fused_kernel: bool = True

    @nn.compact
    def __call__(self, x, padding_mask=None, time_diffs=None, training: bool = False):
        if self.d_model % self.n_heads != 0:
            raise ValueError(f"d_model ({self.d_model}) must be divisible by n_heads ({self.n_heads}).")
        b, l, _ = x.shape
        h, dqk, dv = self.n_heads, self.dqk, self.dv
        alpha = 1.0 / math.sqrt(dqk)

        # LayerNorm statistics in f32; projections + attention in the compute
        # dtype (bf16 under mixed precision — MXU 2x rate; the Pallas kernel
        # always accumulates in f32)
        x_normed = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_in")(x)
        proj = jax.nn.silu(nn.Dense(2 * h * dqk + 2 * h * dv, kernel_init=torch_linear_init, dtype=compute_dtype(), name="proj1")(x_normed))
        q = proj[..., : h * dqk].reshape(b, l, h, dqk)
        k = proj[..., h * dqk: 2 * h * dqk].reshape(b, l, h, dqk)
        u = proj[..., 2 * h * dqk: 2 * h * dqk + h * dv].reshape(b, l, h * dv)
        v = proj[..., 2 * h * dqk + h * dv:].reshape(b, l, h, dv)

        rab = RelativeBucketedTimeAndPositionBias(
            n_heads=h,
            max_seq_len=self.max_seq_len,
            num_time_buckets=self.num_time_buckets,
            time_bucket_fn=self.time_bucket_fn,
            time_bucket_divisor=self.time_bucket_divisor,
            time_bucket_unit=self.time_bucket_unit,
            name="rab",
        )

        if self.use_fused_kernel:
            # on-the-fly rab: only the SMALL tables reach the kernel — no
            # (B,H,L,L) bias tensor materializes in fwd or bwd
            from ..ops.pallas.hstu_rab_attention import BucketCfg, hstu_attention_rab

            pos_w, ts_w = rab.tables()
            cfg = BucketCfg(num_buckets=self.num_time_buckets, fn=self.time_bucket_fn, divisor=self.time_bucket_divisor, unit=self.time_bucket_unit)
            mask = padding_mask if padding_mask is not None else jnp.ones((b, l), dtype=bool)
            # round-4 sweep (BASELINE.md): block_k=128 wins at L<=1024 (3.64 vs
            # 4.06 ms at B8xL256 d64; 19.6 vs 20.1 ms at B8xL1024 d32), 256
            # wins at L2048 (13.9 vs 14.7 ms)
            block_k = 256 if l >= 2048 and l % 256 == 0 else 128
            attn_out = hstu_attention_rab(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), pos_w, ts_w, time_diffs, mask, alpha, self.max_seq_len, cfg, 128, block_k
            )  # (B, H, L, dv)
            out = attn_out.transpose(0, 2, 1, 3).reshape(b, l, h * dv)
        else:
            bias = rab(time_diffs=time_diffs, seq_len=l)
            scores = jnp.einsum("blhd,bmhd->bhlm", q, k) * alpha + bias
            valid = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
            if padding_mask is not None:
                valid = valid & padding_mask[:, None, None, :]
            scores = jnp.where(valid, scores, -1e4)
            attn = jax.nn.silu(scores) / self.max_seq_len
            out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(b, l, h * dv)
        gated = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_attn")(out) * u
        gated = nn.Dropout(self.dropout, deterministic=not training)(gated)
        return nn.Dense(self.d_model, kernel_init=torch_linear_init, dtype=compute_dtype(), name="proj2")(gated)


class HSTUBlock(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 4
    dqk: int = 64
    dv: int = 64
    dropout: float = 0.1
    max_seq_len: int = 200
    num_time_buckets: int = 128
    time_bucket_fn: str = "sqrt"
    time_bucket_divisor: float = 1.0
    time_bucket_unit: str = "minutes"
    use_fused_kernel: bool = True

    @nn.compact
    def __call__(self, x, padding_mask=None, time_diffs=None, training: bool = False):
        for i in range(self.n_layers):
            layer = HSTULayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                dqk=self.dqk,
                dv=self.dv,
                dropout=self.dropout,
                max_seq_len=self.max_seq_len,
                num_time_buckets=self.num_time_buckets,
                time_bucket_fn=self.time_bucket_fn,
                time_bucket_divisor=self.time_bucket_divisor,
                time_bucket_unit=self.time_bucket_unit,
                use_fused_kernel=self.use_fused_kernel,
                name=f"layer_{i}",
            )
            x = x + layer(x, padding_mask=padding_mask, time_diffs=time_diffs, training=training)
        return x
