"""HSTU / HLLM utilities: relative biases and vocabulary masking.

Parity with ``torch_rechub/utils/hstu_utils.py``: ``RelPosBias`` (bucketed
|i-j| bias for HLLM blocks), ``RelativeBucketedTimeAndPositionBias`` (HSTU
Eq.3 ``rab^{p,t}``: position table of ``2L-1`` slots + time-difference bucket
table), and ``apply_vocab_mask`` (PAD / seen-item filtering at ranking time,
functional instead of a buffer-holding module).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class RelPosBias(nn.Module):
    """Bucketed |i-j| relative-position bias -> ``(1, H, L, L)``.

    Reference ``hstu_utils.py:9-68``.
    """

    n_heads: int
    max_seq_len: int
    num_buckets: int = 32

    @nn.compact
    def __call__(self, seq_len: int):
        bound = math.sqrt(1.0 / self.num_buckets)
        table = self.param("rel_pos_bias_table", lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound), (self.num_buckets, self.n_heads))
        pos = jnp.arange(seq_len)
        rel = jnp.abs(pos[None, :] - pos[:, None])
        rel = jnp.minimum(rel, self.max_seq_len)
        buckets = rel * (self.num_buckets - 1) // self.max_seq_len
        bias = table[buckets]  # (L, L, H)
        return jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, L, L)


def bucketize_time(dt, num_buckets: int, fn: str = "sqrt", divisor: float = 1.0, unit: str = "minutes", max_bucket: Optional[int] = None):
    """Map |seconds deltas| to bucket indices (reference ``hstu_utils.py:117-129``)."""
    dt = jnp.abs(dt.astype(jnp.float32))
    if unit == "minutes":
        dt = dt / 60.0
    dt = jnp.maximum(dt, 1e-6)
    b = jnp.sqrt(dt) if fn == "sqrt" else jnp.log(dt)
    hi = num_buckets if max_bucket is None else max_bucket
    return jnp.clip(b / divisor, 0, hi).astype(jnp.int32)


class RelativeBucketedTimeAndPositionBias(nn.Module):
    """HSTU ``rab^{p,t}`` (reference ``hstu_utils.py:71-166``).

    Position table ``(2*max_seq_len-1, H)`` indexed by ``i-j``; time table
    ``(num_time_buckets+1, H)`` indexed by bucketized pairwise |dt|.  Returns
    ``(B, H, L, L)`` with time, else ``(1, H, L, L)`` position-only.
    """

    n_heads: int
    max_seq_len: int
    num_time_buckets: int = 128
    time_bucket_fn: str = "sqrt"
    time_bucket_divisor: float = 1.0
    time_bucket_unit: str = "minutes"

    def setup(self):
        if self.time_bucket_fn not in ("sqrt", "log"):
            raise ValueError(f"Unsupported time_bucket_fn: {self.time_bucket_fn}")
        n_pos = 2 * self.max_seq_len - 1
        bp = math.sqrt(1.0 / n_pos)
        self.pos_w = self.param("pos_w", lambda k, s: jax.random.uniform(k, s, minval=-bp, maxval=bp), (n_pos, self.n_heads))
        bt = math.sqrt(1.0 / (self.num_time_buckets + 1))
        self.ts_w = self.param("ts_w", lambda k, s: jax.random.uniform(k, s, minval=-bt, maxval=bt), (self.num_time_buckets + 1, self.n_heads))

    def tables(self):
        """The raw ``(2L-1, H)`` position / ``(nb+1, H)`` time tables — used by
        the fused Pallas kernel, which reconstructs bias tiles on the fly."""
        return self.pos_w, self.ts_w

    def __call__(self, time_diffs=None, seq_len: Optional[int] = None):
        pos_w, ts_w = self.pos_w, self.ts_w

        if time_diffs is None:
            if seq_len is None:
                raise ValueError("Provide either `time_diffs` or `seq_len`.")
            length = seq_len
        else:
            length = time_diffs.shape[1]
        if length > self.max_seq_len:
            raise ValueError(f"seq_len ({length}) exceeds max_seq_len ({self.max_seq_len}).")

        pos = jnp.arange(length)
        rel_idx = pos[None, :] - pos[:, None] + (self.max_seq_len - 1)
        pos_bias = jnp.transpose(pos_w[rel_idx], (2, 0, 1))[None]  # (1, H, L, L)
        if time_diffs is None:
            return pos_bias
        dt_pair = time_diffs[:, :, None] - time_diffs[:, None, :]
        buckets = bucketize_time(dt_pair, self.num_time_buckets, self.time_bucket_fn, self.time_bucket_divisor, self.time_bucket_unit)
        time_bias = jnp.transpose(ts_w[buckets], (0, 3, 1, 2))  # (B, H, L, L)
        return pos_bias + time_bias


def apply_vocab_mask(logits, static_invalid=None, invalid_ids=None, vocab_size: Optional[int] = None):
    """Suppress invalid/seen items in scores (reference ``hstu_utils.py:169-222``).

    Args:
        logits: ``(..., V)`` scores.
        static_invalid: iterable of always-invalid token ids (e.g. ``[0]``).
        invalid_ids: per-row ``(B, N)`` (or 1-D broadcast) ids to suppress.
    """
    v = vocab_size or logits.shape[-1]
    out = logits
    if static_invalid is not None:
        static = jnp.zeros((v,), dtype=bool).at[jnp.asarray(list(static_invalid))].set(True)
        out = jnp.where(static, -1e9, out)
    if invalid_ids is not None:
        invalid_ids = jnp.asarray(invalid_ids)
        if invalid_ids.ndim == 1:
            invalid_ids = jnp.broadcast_to(invalid_ids[None, :], (out.shape[0], invalid_ids.shape[0]))
        if out.ndim != 2 or invalid_ids.ndim != 2:
            raise ValueError("dynamic invalid_ids masking expects logits (B, V) and invalid_ids (B, N)")
        valid = (invalid_ids >= 0) & (invalid_ids < v)
        # out-of-range ids fall back to id 0, like the reference's masked_fill(0)
        safe = jnp.where(valid, invalid_ids, 0)
        out = out.at[jnp.arange(out.shape[0])[:, None], safe].set(-1e9)
    return out
