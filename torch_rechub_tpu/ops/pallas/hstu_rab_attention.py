"""HSTU silu-attention with ON-THE-FLY relative position/time bias — Pallas.

Round-2 upgrade over ``hstu_attention.py`` (which streams a materialized
``(B|1, H, L, L)`` bias from HBM): here the kernel receives only the SMALL
bias tables — ``pos_w (2*maxL-1, H)`` and ``ts_w (nb+1, H)`` — plus the raw
per-position timestamps ``(B, L)``, and reconstructs every bias tile in VMEM:

- position term: ``bias[l, m] = pos_w[m - l + maxL - 1, h]`` is Toeplitz, so
  each query block builds its ``(block_q, L)`` band once per program with
  ``block_q`` dynamic sublane slices of the head's table column;
- time term: ``ts_w[bucket(|t_l - t_m|), h]`` where ``bucket`` is monotone in
  ``|dt|`` — round 5 replaces per-tile bucketization with PRECOMPUTED integer
  thresholds (``compute_bucket_thresholds``: exact binary search against the
  bucketize fn); the tile's [lo, hi] bucket range comes from a scalar SMEM
  binary search, the bias telescopes ``tw[lo] + sum Δ_u * (adt >= thr_u)``
  over ``(lo, hi]`` (an EMPTY loop for single-bucket tiles — clipped
  far-past deltas), and correctness never depends on timestamp sortedness.

Backward (round 5): ONE fused kernel produces dq/dk/dv/dpos/dts — grid over
k-blocks with dq as a sequentially-revisited full-length accumulator block
(TPU Pallas grids execute in order, so RMW accumulation is race-free); each
causal tile is rebuilt once instead of 2-3x.  Position-table gradients use a
coarse/fine sublane-group shift decomposition (groups coarse-rolled and
summed first, fine log-doubling on one 8-row strip); time-table gradients
are cumulative sums differenced outside the kernel.  The split
``_bwd_dq_kernel``/``_bwd_dkv_kernel`` remain behind ``_FUSED_BWD[0]=False``
for A/B, and ``_bias_table_grads``/``_skew_diag_sums`` as a tested XLA
reference implementation.

Measured on a v5e vs the dense XLA path — fwd+bwd incl. all five gradients,
timed DEVICE-SIDE (20 steps per dispatch via lax.scan, so per-call transport
latency is excluded; ``benchmarks/perf/hstu_bench.py``): round 5 runs
B8xL256 in 2.6-3.3ms (2.7x dense), B4xL1024 in 6.3-6.7ms (9.8x), B2xL2048
in 8.1ms (18.5x) — 1.6-1.7x over the round-4 split kernels — and B16xL2048
at 554-591k tokens/s (f32-bf16) where the dense path fails to compile
(O(L^2) HBM).
Numerics vs dense verified at every shape; dq/dk/dv bit-match the split
kernels.  Component budget + remaining ceiling: BASELINE.md round-5.

Reference semantics: ``torch_rechub/basic/layers.py:892-916`` (Eq.3) with
``torch_rechub/utils/hstu_utils.py:129-166`` (rab^{p,t}).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

try:  # pallas availability is backend-dependent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_FORCE_INTERPRET = [False]  # tests flip this to exercise kernels on CPU
_FUSED_BWD = [True]  # False falls back to the split dq/dkv kernels (A/B bench)
# Isolation-patch knobs for the component-cost breakdowns in BASELINE.md —
# NEVER set outside perf experiments (they silently break numerics).
# Members: "walk" (dts gradient walk), "bwd_select" (bias re-select in bwd),
# "fwd_select" (bias select in fwd), "dpos" (position-gradient diagonal sums).
_DEBUG_DISABLE: set = set()


class BucketCfg(NamedTuple):
    """Static time-bucketization config (mirrors ``bucketize_time``)."""

    num_buckets: int = 128
    fn: str = "sqrt"  # "sqrt" | "log"
    divisor: float = 1.0
    unit: str = "minutes"  # "minutes" | "seconds"


def _bucketize(dt_int, cfg: BucketCfg):
    """|int time delta| -> bucket index, identical to utils.hstu_utils.bucketize_time."""
    dt = jnp.abs(dt_int.astype(jnp.float32))
    if cfg.unit == "minutes":
        dt = dt / 60.0
    dt = jnp.maximum(dt, 1e-6)
    b = jnp.sqrt(dt) if cfg.fn == "sqrt" else jnp.log(dt)
    return jnp.clip(b / cfg.divisor, 0, cfg.num_buckets).astype(jnp.int32)


def compute_bucket_thresholds(cfg: BucketCfg) -> jnp.ndarray:
    """``thr[u]`` = smallest int ``|dt|`` with ``_bucketize(dt) >= u`` (i32, ``(nb+1,)``).

    Replaces per-tile bucketization inside the kernels: monotonicity of
    ``_bucketize`` in ``|dt|`` (division/sqrt/log/clip/trunc are all monotone
    under correctly-rounded f32) gives ``bucket(dt) >= u  <=>  |dt| >= thr[u]``
    EXACTLY, so the kernels replace the per-bucket equality select with
    compare-accumulate against precomputed integer boundaries.  Computed by
    31-step vectorized binary search with ``_bucketize`` itself as the
    predicate, so f32 rounding at the bucket edges is reproduced by
    construction (property-tested in ``test_pallas_hstu_rab.py``).
    Unreachable buckets get the i32-max sentinel; the kernels only walk
    ``u <= bucket(max |dt| in tile)``, which never reaches a sentinel.
    """
    nbp1 = cfg.num_buckets + 1
    imax = jnp.iinfo(jnp.int32).max
    u = jnp.arange(nbp1, dtype=jnp.int32)
    lo = jnp.zeros((nbp1,), jnp.int32)
    hi = jnp.full((nbp1,), imax, jnp.int32)  # invariant: predicate holds at hi (if reachable)

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2  # overflow-safe midpoint
        ok = _bucketize(mid, cfg) >= u
        return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    reachable = _bucketize(jnp.full((nbp1,), imax, jnp.int32), cfg) >= u
    thr = jnp.where(reachable, hi, imax)
    # sqrt and division are correctly rounded (IEEE), so the search result is
    # exactly minimal for fn="sqrt".  XLA's log approximation need not be
    # ULP-monotone, which can break the bisection invariant by a few ints at
    # a boundary — repair upward to the first candidate that actually reaches
    # bucket u, so ``bucketize(thr[u]) >= u`` always holds; any remaining
    # kernel-vs-dense disagreement is confined to log's ULP-wobble ints just
    # below a boundary (property-tested).
    if cfg.fn != "sqrt":
        cand = jnp.minimum(thr, imax - 64)[:, None] + jnp.arange(64, dtype=jnp.int32)[None, :]
        ok = _bucketize(cand, cfg) >= u[:, None]
        thr = jnp.where(reachable, jnp.min(jnp.where(ok, cand, imax), axis=1), imax)
    return thr.at[0].set(0)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# ---------------------------------------------------------------------------
# dense reference (fallback + grads-of-tables + tests)
# ---------------------------------------------------------------------------

def _dense_bias(pos_w, ts_w, timestamps, l, max_seq_len, cfg: BucketCfg, has_time: bool):
    pos = jnp.arange(l)
    rel = pos[None, :] - pos[:, None] + (max_seq_len - 1)
    bias = jnp.transpose(pos_w[rel], (2, 0, 1))[None]  # (1, H, L, L)
    if has_time:
        dt = timestamps[:, :, None] - timestamps[:, None, :]
        buckets = _bucketize(dt, cfg)
        bias = bias + jnp.transpose(ts_w[buckets], (0, 3, 1, 2))
    return bias


def _dense_forward(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, has_time):
    l = q.shape[2]
    bias = _dense_bias(pos_w, ts_w, timestamps, l, max_seq_len, cfg, has_time)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k) * alpha + bias
    valid = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
    if padding_mask is not None:
        valid = valid & padding_mask[:, None, None, :]
    scores = jnp.where(valid, scores, -1e4)
    attn = _silu(scores) / max_seq_len
    return jnp.einsum("bhlm,bhmd->bhld", attn, v.astype(attn.dtype)).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _build_band(pw_ref, band_ref, start, rows, cols):
    """``band[i, c] = pos_w[start + (rows-1-i) + c]`` — Toeplitz rows.

    ONE dynamic sublane read fetches the base window; the per-row left shift
    ``rows-1-i`` then splits as COARSE + FINE (round-5): with ``i = 8a + b``,
    shift = ``(rows-8-8a) + (7-b)`` — the fine part depends only on the
    position within an 8-row sublane group, so ONE ``(8, w3)`` strip with
    rows ``base << (7-b)`` is built by 3 masked log-doubling rolls, and each
    group is then a single whole-strip roll of it.  ~5x fewer VPU roll ops
    than the round-2..4 whole-tile log-doubling (log2(rows) masked rolls on
    the full ``(rows, w3)`` tile).  No wraparound reaches ``[:, :cols]``
    because ``c + rows-1-i < cols + rows``.
    """
    w3 = cols + rows
    base = pw_ref[0, pl.ds(start, w3), 0].reshape(1, w3)
    brow = jax.lax.broadcasted_iota(jnp.int32, (8, w3), 0)
    strip = jnp.broadcast_to(pltpu.roll(base, w3 - 7, 1), (8, w3))  # left by 7
    for sh in (1, 2, 4):  # right by b => row b is base left-shifted by 7-b
        strip = jnp.where((brow & sh) != 0, pltpu.roll(strip, sh, 1), strip)
    for a in range(rows // 8):
        band_ref[8 * a:8 * a + 8, :] = pltpu.roll(strip, (w3 - (rows - 8 - 8 * a)) % w3, 1)[:, :cols]


_TW_CHUNK = 16  # buckets per loop iteration (measured: 16 beats 8 and 4 on v5e —
# the scalar fori overhead outweighs the <= chunk-1 bucket overshoot)
_WALK_ACC16 = True  # amortize the dts walk's cross-lane reduce over the chunk


def _tw_select(tw_ref, head, bucket):
    """On-the-fly ts_w[bucket] for one tile: accumulate ``ts_w[u] * (bucket==u)``
    over the tile's actual [min, max] bucket range (near-sorted timestamps =>
    few buckets per tile; correctness holds for any order).  The range is
    walked ``_TW_CHUNK`` buckets per iteration; reads past ``hi`` clamp to the
    last table slot and contribute zero (no bucket matches there).

    Legacy path (split bwd kernels); the fwd + fused-bwd kernels use the
    threshold-based :func:`_tw_select_thr` instead."""
    lo = jnp.min(bucket)
    hi = jnp.max(bucket)
    last = tw_ref.shape[1] - 1

    def body(c, acc):
        u0 = lo + c * _TW_CHUNK
        for j in range(_TW_CHUNK):
            u = jnp.minimum(u0 + j, last)
            acc = acc + tw_ref[head, u] * (bucket == (u0 + j)).astype(jnp.float32)
        return acc

    n = (hi - lo + _TW_CHUNK) // _TW_CHUNK
    return jax.lax.fori_loop(0, n, body, jnp.zeros(bucket.shape, jnp.float32))


def _rank_in_thresholds(thr_ref, x, nbp1):
    """max u in [0, nbp1) with ``thr[u] <= x`` — equals ``_bucketize(x)`` for
    the tile's min/max ``|dt|`` scalars, computed by an unrolled bit-descent
    binary search over the SMEM threshold table (8 scalar reads for nb=128;
    no sqrt/log on the VPU)."""
    last = nbp1 - 1
    step = 1
    while step * 2 < nbp1:
        step *= 2
    u = jnp.int32(0)
    while step >= 1:
        cand = u + step
        ok = (cand <= last) & (thr_ref[0, jnp.minimum(cand, last)] <= x)
        u = jnp.where(ok, cand, u)
        step //= 2
    return u


def _tw_select_thr(tw_ref, thr_ref, head, adt, lo, hi):
    """ts_w[bucket(adt)] via monotone compare-accumulate (no bucket tile).

    ``bucket(dt) >= u  <=>  |dt| >= thr[u]`` exactly (see
    :func:`compute_bucket_thresholds`), so the per-element table value
    telescopes: ``tw[lo] + sum_{u in (lo, hi]} (tw[u] - tw[u-1]) * (adt >= thr[u])``.
    Single-bucket tiles (common: clipped far-past deltas, dense repeats) walk
    an EMPTY range — one scalar broadcast instead of 8 masked selects."""
    acc = jnp.zeros(adt.shape, jnp.float32) + tw_ref[head, lo]
    last = tw_ref.shape[1] - 1

    def body(c, acc):
        u0 = lo + 1 + c * _TW_CHUNK
        for j in range(_TW_CHUNK):
            u = u0 + j
            uc = jnp.minimum(u, last)
            d = (tw_ref[head, uc] - tw_ref[head, uc - 1]) * (u <= hi).astype(jnp.float32)
            # compare + select-accumulate: one fewer VPU op per bucket than
            # the d * mask.astype(f32) form (no bool->f32 materialization)
            acc = jnp.where(adt >= thr_ref[0, uc], acc + d, acc)
        return acc

    n = (hi - lo + _TW_CHUNK - 1) // _TW_CHUNK
    return jax.lax.fori_loop(0, n, body, acc)


def _fwd_kernel(pw_ref, tw_ref, thr_ref, ts_ref, q_ref, k_ref, v_ref, mask_ref, out_ref, band_ref, *, alpha, inv_n, block_q, block_k, max_seq_len, cfg, has_time, n_heads):
    qi = pl.program_id(1)
    head = pl.program_id(0) % n_heads
    l = k_ref.shape[1]
    q0 = qi * block_q
    center = max_seq_len - 1
    _build_band(pw_ref, band_ref, center - q0 - (block_q - 1), block_q, l)

    q = q_ref[0]  # (block_q, dqk)
    acc = jnp.zeros((block_q, v_ref.shape[-1]), jnp.float32)
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    tq = ts_ref[0, 0, pl.ds(q0, block_q)] if has_time else None

    num_k = pl.cdiv((qi + 1) * block_q, block_k)

    def body(ki, acc):
        k0 = pl.multiple_of(ki * block_k, block_k)
        k_blk = k_ref[0, pl.ds(k0, block_k), :]
        v_blk = v_ref[0, pl.ds(k0, block_k), :]
        m_blk = mask_ref[0, 0, pl.ds(k0, block_k)]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * alpha + band_ref[:, pl.ds(k0, block_k)]
        if has_time:
            tk = ts_ref[0, 0, pl.ds(k0, block_k)]
            adt = jnp.abs(tq[:, None] - tk[None, :])
            nbp1 = tw_ref.shape[1]
            lo = _rank_in_thresholds(thr_ref, jnp.min(adt), nbp1)
            hi = _rank_in_thresholds(thr_ref, jnp.max(adt), nbp1)
            if "fwd_select" not in _DEBUG_DISABLE:
                s = s + _tw_select_thr(tw_ref, thr_ref, head, adt, lo, hi)
        k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = (k_pos <= q_pos) & (m_blk[None, :] > 0)
        s = jnp.where(valid, s, -1e4)
        # attn rounds to the input dtype for the PV matmul (bf16 under mixed
        # precision — MXU path); accumulation stays f32 via preferred_element_type
        attn = (_silu(s) * inv_n).astype(v_blk.dtype)
        return acc + jax.lax.dot_general(attn, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_k, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels (dq; dk/dv) — same tile recompute, transposed loops
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(pw_ref, tw_ref, thr_ref, ts_ref, q_ref, k_ref, v_ref, g_ref, mask_ref, dq_ref, dpos_ref, dts_ref, band_ref, dpos_acc, *, alpha, inv_n, block_q, block_k, max_seq_len, cfg, has_time, n_heads):
    """dq + per-program dpos/dts partials, all from the same recomputed tiles.

    dpos: each ds tile is lane-rotated by log-doubling so element (i, c)
    lands at diagonal slot k0+c+(block_q-1-i) — the Toeplitz-transpose of the
    forward band build.  dts: the bucket-range loop reduces the tile per
    bucket and scatters the scalar into a LANE-major ``(1, nb_lanes)``
    register row via a lane one-hot — the row rides the k-tile loop carry and
    is written once (the round-3 version RMW'd a ``(nb, 1)`` sublane column
    per bucket, whose 1-lane ops serialized the whole backward: measured 2x
    bwd time at L2048).
    """
    qi = pl.program_id(1)
    head = pl.program_id(0) % n_heads
    l = k_ref.shape[1]
    q0 = qi * block_q
    wp = l + block_q
    nb_lanes = dts_ref.shape[-1]
    center = max_seq_len - 1
    _build_band(pw_ref, band_ref, center - q0 - (block_q - 1), block_q, l)
    dpos_acc[0, :] = jnp.zeros((wp,), jnp.float32)

    q = q_ref[0]
    g = g_ref[0]  # (block_q, dv)
    dq_acc = jnp.zeros_like(q, shape=(block_q, q.shape[-1]), dtype=jnp.float32)
    dts_row = jnp.zeros((1, nb_lanes), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb_lanes), 1)
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    tq = ts_ref[0, 0, pl.ds(q0, block_q)] if has_time else None

    num_k = pl.cdiv((qi + 1) * block_q, block_k)

    def body(ki, carry):
        dq_acc, dts_row = carry
        k0 = pl.multiple_of(ki * block_k, block_k)
        k_blk = k_ref[0, pl.ds(k0, block_k), :]
        v_blk = v_ref[0, pl.ds(k0, block_k), :]
        m_blk = mask_ref[0, 0, pl.ds(k0, block_k)]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * alpha + band_ref[:, pl.ds(k0, block_k)]
        if has_time:
            tk = ts_ref[0, 0, pl.ds(k0, block_k)]
            bucket = _bucketize(tq[:, None] - tk[None, :], cfg)
            s = s + _tw_select(tw_ref, head, bucket)
        k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = (k_pos <= q_pos) & (m_blk[None, :] > 0)
        s = jnp.where(valid, s, -1e4)
        # dattn = g @ v^T ; ds = dattn * silu'(s) * inv_n
        dattn = jax.lax.dot_general(g, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = jnp.where(valid, dattn * _dsilu(s) * inv_n, 0.0)

        # --- bias-table grads from this tile ---
        if has_time:
            # recompute the bucket map here (cheap VPU arithmetic) instead of
            # holding the (bq, bk) i32 tile live across the two dots above —
            # shorter live range, less register pressure
            bucket2 = _bucketize(tq[:, None] - tk[None, :], cfg)
            lo = jnp.min(bucket2)
            hi = jnp.max(bucket2)

            def dts_body(c, row):
                u0 = lo + c * _TW_CHUNK
                for j in range(_TW_CHUNK):
                    u = u0 + j  # u > nb contributes 0 (no bucket matches)
                    row = row + jnp.sum(ds * (bucket2 == u)) * (lane == u).astype(jnp.float32)
                return row

            dts_row = jax.lax.fori_loop(0, (hi - lo + _TW_CHUNK) // _TW_CHUNK, dts_body, dts_row)
        # accumulate this tile's diagonal sums into a (bq+bk) lane window at
        # offset k0: element (i, c) lands at slot c + (bq-1-i), i.e. row i
        # rolls right by (bq-1)-i — done by log-doubling (roll all rows by
        # bq-1, then per-bit masked rolls left by i), then one column sum
        wt = block_q + block_k
        x = jnp.concatenate([ds, jnp.zeros((block_q, block_q), jnp.float32)], axis=1)
        x = pltpu.roll(x, block_q - 1, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, wt), 0)
        sh = 1
        while sh < block_q:
            x = jnp.where((row & sh) != 0, pltpu.roll(x, wt - sh, 1), x)
            sh *= 2
        dpos_acc[0, pl.ds(k0, wt)] += jnp.sum(x, axis=0)

        dq_acc = dq_acc + jax.lax.dot_general(ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * alpha
        return dq_acc, dts_row

    dq_acc, dts_row = jax.lax.fori_loop(0, num_k, body, (dq_acc, dts_row))
    dq_ref[0] = dq_acc.astype(dq_ref.dtype)
    dts_ref[0, 0] = dts_row
    dpos_ref[0, 0, 0, :] = dpos_acc[0, :]


def _bwd_dkv_kernel(pw_ref, tw_ref, thr_ref, ts_ref, q_ref, k_ref, v_ref, g_ref, mask_ref, dk_ref, dv_ref, band_ref, *, alpha, inv_n, block_q, block_k, max_seq_len, cfg, has_time, n_heads):
    ki = pl.program_id(1)
    head = pl.program_id(0) % n_heads
    l = q_ref.shape[1]
    k0 = ki * block_k
    center = max_seq_len - 1
    # ONE band build per program (not per q-tile): band[i, m] =
    # pos_w[center + k0 - l + 1 + (bq-1-i) + m]; the q0-tile is then the lane
    # slice at offset l - block_q - q0, since
    # (center + k0 - l + 1) + (bq-1-i) + (l - bq - q0 + j) = center + (k0+j) - (q0+i).
    # Reads stay in [center + k0 - l + 1, center + k0 + bk - 1] ⊆ [0, 2*maxL-2]
    # because maxL >= l >= block_k.
    wband = l + block_k - block_q
    _build_band(pw_ref, band_ref, center + k0 - l + 1, block_q, wband)

    k_blk = k_ref[0]  # (block_k, dqk)
    v_blk = v_ref[0]  # (block_k, dv)
    m_blk = mask_ref[0, 0, pl.ds(k0, block_k)]
    dk_acc = jnp.zeros((block_k, k_blk.shape[-1]), jnp.float32)
    dv_acc = jnp.zeros((block_k, v_blk.shape[-1]), jnp.float32)
    k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    tk = ts_ref[0, 0, pl.ds(k0, block_k)] if has_time else None

    first_q = k0 // block_q  # first query block intersecting the causal cone
    num_q = l // block_q

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q0 = pl.multiple_of(qi * block_q, block_q)
        q_blk = q_ref[0, pl.ds(q0, block_q), :]
        g_blk = g_ref[0, pl.ds(q0, block_q), :]

        s = jax.lax.dot_general(q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        # the band offset is a multiple of block_q by construction (l, q0 are);
        # the explicit hint survives the subtraction, which Mosaic's alignment
        # analysis otherwise can't prove for a 128-lane vector load
        s = s * alpha + band_ref[:, pl.ds(pl.multiple_of(l - block_q - q0, block_q), block_k)]
        if has_time:
            tq = ts_ref[0, 0, pl.ds(q0, block_q)]
            s = s + _tw_select(tw_ref, head, _bucketize(tq[:, None] - tk[None, :], cfg))
        q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        valid = (k_pos <= q_pos) & (m_blk[None, :] > 0)
        s = jnp.where(valid, s, -1e4)
        attn = _silu(s) * inv_n
        dattn = jax.lax.dot_general(g_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = jnp.where(valid, dattn * _dsilu(s) * inv_n, 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(attn.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dk_acc = dk_acc + jax.lax.dot_general(ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32) * alpha
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(first_q, num_q, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd_fused_kernel(pw_ref, tw_ref, thr_ref, ts_ref, q_ref, k_ref, v_ref, g_ref, mask_ref, dq_ref, dk_ref, dv_ref, dpos_ref, dts_ref, band_ref, dpos_acc, *, alpha, inv_n, block_q, block_k, max_seq_len, cfg, has_time, n_heads):
    """ONE backward pass: dq + dk + dv + dpos/dts partials per (bh, k-block).

    Round-5 fusion of ``_bwd_dq_kernel`` + ``_bwd_dkv_kernel``: the score tile
    ``s`` and ``dattn = g @ v^T`` were recomputed by BOTH kernels, and the
    time-bucket select/bucketize ran three times per causal tile (dq select,
    dq walk recompute, dkv select).  Here the grid runs over k-blocks (like
    the dkv kernel) and ``dq`` is a FULL-LENGTH output block whose index map
    ignores the k axis: TPU Pallas grids execute sequentially, so the block
    stays resident in VMEM across the inner k steps and read-modify-write
    accumulation (`dq_ref[...] += ...`) is race-free — it is written back to
    HBM once per (batch*head) row.  Every causal tile is now built ONCE:
    one band build per program, one qk^T, one g v^T, one bucketize + select,
    and the dts gradient walk reuses the same bucket map and [lo, hi] range.

    dq accumulates in f32 (the output is declared f32 and cast by the host
    wrapper) in the same k-ascending order as the split kernel, so dq/dk/dv
    are bit-identical to the two-kernel version; dpos/dts partials sum in a
    different (per-k-program) order — same values within f32 reassociation.
    """
    ki = pl.program_id(1)
    head = pl.program_id(0) % n_heads
    l = q_ref.shape[1]
    k0 = ki * block_k
    center = max_seq_len - 1
    wband = l + block_k - block_q
    wp2 = l + block_k
    nb_lanes = dts_ref.shape[-1]
    _build_band(pw_ref, band_ref, center + k0 - l + 1, block_q, wband)
    dpos_acc[0, :] = jnp.zeros((wp2,), jnp.float32)

    @pl.when(ki == 0)
    def _init_dq():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    k_blk = k_ref[0]  # (block_k, dqk)
    v_blk = v_ref[0]  # (block_k, dv)
    m_blk = mask_ref[0, 0, pl.ds(k0, block_k)]
    dk_acc = jnp.zeros((block_k, k_blk.shape[-1]), jnp.float32)
    dv_acc = jnp.zeros((block_k, v_blk.shape[-1]), jnp.float32)
    dts_row = jnp.zeros((1, nb_lanes), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb_lanes), 1)
    k_pos = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    tk = ts_ref[0, 0, pl.ds(k0, block_k)] if has_time else None

    first_q = k0 // block_q  # first query block intersecting the causal cone
    num_q = l // block_q

    def body(qi, carry):
        dk_acc, dv_acc, dts_row = carry
        q0 = pl.multiple_of(qi * block_q, block_q)
        q_blk = q_ref[0, pl.ds(q0, block_q), :]
        g_blk = g_ref[0, pl.ds(q0, block_q), :]

        s = jax.lax.dot_general(q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * alpha + band_ref[:, pl.ds(pl.multiple_of(l - block_q - q0, block_q), block_k)]
        if has_time:
            tq = ts_ref[0, 0, pl.ds(q0, block_q)]
            adt = jnp.abs(tq[:, None] - tk[None, :])
            nbp1 = tw_ref.shape[1]
            lo = _rank_in_thresholds(thr_ref, jnp.min(adt), nbp1)
            hi = _rank_in_thresholds(thr_ref, jnp.max(adt), nbp1)
            if "bwd_select" not in _DEBUG_DISABLE:
                s = s + _tw_select_thr(tw_ref, thr_ref, head, adt, lo, hi)
        q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        valid = (k_pos <= q_pos) & (m_blk[None, :] > 0)
        s = jnp.where(valid, s, -1e4)
        # one sigmoid per tile shared by silu (fwd recompute) and silu'
        sig = jax.nn.sigmoid(s)
        attn = (s * sig) * inv_n
        dattn = jax.lax.dot_general(g_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = jnp.where(valid, dattn * (sig * (1.0 + s * (1.0 - sig))) * inv_n, 0.0)

        dv_acc = dv_acc + jax.lax.dot_general(attn.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dk_acc = dk_acc + jax.lax.dot_general(ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32) * alpha
        dq_ref[0, pl.ds(q0, block_q), :] += jax.lax.dot_general(ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * alpha

        # --- bias-table grads, reusing this tile's adt map and range ---
        # The walk emits CUMULATIVE sums S(u) = sum(ds * (adt >= thr[u]));
        # the host wrapper differences adjacent lanes (dts[u] = S[u] - S[u+1]).
        # S(u) for u <= lo is the full-tile sum (every element's bucket >= lo),
        # filled with one masked broadcast; single-bucket tiles walk an EMPTY
        # range — one reduction instead of eight.
        if has_time and "walk" not in _DEBUG_DISABLE:
            total = jnp.sum(ds)
            dts_row = dts_row + total * (lane <= lo).astype(jnp.float32)
            last_thr = nbp1 - 1

            if _WALK_ACC16:
                # amortized cross-lane reduction: per chunk, _TW_CHUNK
                # per-bucket SUBLANE-only partial rows are stacked
                # (_TW_CHUNK, block_k) and cross-lane-reduced ONCE, then
                # placed into _TW_CHUNK lanes of the cumulative row with a
                # single sublane/lane iota compare
                srow_k = jax.lax.broadcasted_iota(jnp.int32, (_TW_CHUNK, 1), 0)
                lane16 = jax.lax.broadcasted_iota(jnp.int32, (_TW_CHUNK, nb_lanes), 1)
                sub16 = jax.lax.broadcasted_iota(jnp.int32, (_TW_CHUNK, nb_lanes), 0)

                def dts_body(c, row):
                    u0 = lo + 1 + c * _TW_CHUNK
                    cols = []
                    for j in range(_TW_CHUNK):
                        uc = jnp.minimum(u0 + j, last_thr)
                        cols.append(jnp.sum(jnp.where(adt >= thr_ref[0, uc], ds, 0.0), axis=0))
                    acc16 = jnp.stack(cols)  # (16, block_k)
                    s16 = jnp.sum(acc16, axis=1, keepdims=True)  # ONE cross-lane reduce
                    s16 = s16 * ((u0 + srow_k) <= hi).astype(jnp.float32)
                    return row + jnp.sum(s16 * (lane16 == u0 + sub16).astype(jnp.float32), axis=0, keepdims=True)

                dts_row = jax.lax.fori_loop(0, (hi - lo + _TW_CHUNK - 1) // _TW_CHUNK, dts_body, dts_row)
            else:

                def dts_body(c, row):
                    u0 = lo + 1 + c * _TW_CHUNK
                    for j in range(_TW_CHUNK):
                        u = u0 + j
                        uc = jnp.minimum(u, last_thr)
                        s_u = jnp.sum(jnp.where(adt >= thr_ref[0, uc], ds, 0.0)) * (u <= hi).astype(jnp.float32)
                        row = row + s_u * (lane == u).astype(jnp.float32)
                    return row

                dts_row = jax.lax.fori_loop(0, (hi - lo + _TW_CHUNK - 1) // _TW_CHUNK, dts_body, dts_row)
        # diagonal sums into the (l + block_k) lane window at offset
        # l - q0 - block_q: element (i, c) of this tile lands at global slot
        # center + (k0 + c) - (q0 + i) = window_base + (l - q0 - bq) + c + (bq-1-i)
        # Row i must shift right by (bq-1-i) before the column sum.  Shift =
        # COARSE (uniform within each 8-row sublane group: bq-8-8a) + FINE
        # (7-b, identical pattern in every group), so the groups can be
        # coarse-rolled and SUMMED FIRST — the fine log-doubling then runs on
        # ONE 8-row strip instead of the full tile (~8x fewer VPU roll ops
        # than the round-4 whole-tile log-doubling; measured ~0.9 ms/step at
        # B2xL2048).
        if "dpos" not in _DEBUG_DISABLE:
            wt = block_q + block_k
            x = jnp.concatenate([ds, jnp.zeros((block_q, block_q), jnp.float32)], axis=1)
            acc8 = jnp.zeros((8, wt), jnp.float32)
            for a in range(block_q // 8):
                acc8 = acc8 + pltpu.roll(x[8 * a:8 * a + 8, :], block_q - 8 - 8 * a, 1)
            brow = jax.lax.broadcasted_iota(jnp.int32, (8, wt), 0)
            acc8 = pltpu.roll(acc8, 7, 1)
            for sh in (1, 2, 4):
                acc8 = jnp.where((brow & sh) != 0, pltpu.roll(acc8, wt - sh, 1), acc8)
            dpos_acc[0, pl.ds(pl.multiple_of(l - q0 - block_q, block_q), wt)] += jnp.sum(acc8, axis=0)
        return dk_acc, dv_acc, dts_row

    dk_acc, dv_acc, dts_row = jax.lax.fori_loop(first_q, num_q, body, (dk_acc, dv_acc, dts_row))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    dts_ref[0, 0, 0, :] = dts_row[0, :]
    dpos_ref[0, 0, 0, :] = dpos_acc[0, :]


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _prep_tables(pos_w, ts_w, cfg):
    """(n_pos, H) / (nb+1, H) -> kernel layouts (H, n_pos_pad8, 1) VMEM + (H, nb+1) SMEM
    + the (1, nb+1) i32 bucket-threshold table (SMEM).

    n_pos = 2*maxL-1 is odd; Mosaic block sublanes must be 8-aligned, so the
    table pads with zero rows at the end (band windows never read past
    2*maxL-2, and the padded slots get no gradient)."""
    n_pos = pos_w.shape[0]
    pad = (-n_pos) % 8
    if pad:
        pos_w = jnp.pad(pos_w, ((0, pad), (0, 0)))
    pw = jnp.transpose(pos_w, (1, 0))[:, :, None]  # (H, n_pos_pad, 1)
    tw = jnp.transpose(ts_w, (1, 0))  # (H, nb+1)
    thr = compute_bucket_thresholds(cfg)[None, :]  # (1, nb+1) i32
    return pw, tw, thr


def _common_specs(h, n_pos, nbp1, b, l, block_q):
    # block dims must be 8/128-aligned or equal to the array dim — hence the
    # n_pos sublane padding, full-table SMEM tw, and (B, 1, L) ts/mask layouts
    pw_spec = pl.BlockSpec((1, n_pos, 1), lambda i, j: (i % h, 0, 0))
    tw_spec = pl.BlockSpec((h, nbp1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    thr_spec = pl.BlockSpec((1, nbp1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    ts_spec = pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0))
    mask_spec = pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0))
    return pw_spec, tw_spec, thr_spec, ts_spec, mask_spec


def _pallas_forward(q, k, v, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q, block_k, interpret):
    b, h, l, dqk = q.shape
    dv = v.shape[-1]
    bh = b * h
    pw, tw, thr = _prep_tables(pos_w, ts_w, cfg)
    maskf = mask[:, None, :].astype(jnp.float32)
    ts = (timestamps.astype(jnp.int32) if has_time else jnp.zeros((b, l), jnp.int32))[:, None, :]
    pw_spec, tw_spec, thr_spec, ts_spec, mask_spec = _common_specs(h, pw.shape[1], tw.shape[1], b, l, block_q)

    kern = functools.partial(_fwd_kernel, alpha=alpha, inv_n=1.0 / max_seq_len, block_q=block_q, block_k=block_k, max_seq_len=max_seq_len, cfg=cfg, has_time=has_time, n_heads=h)
    out = pl.pallas_call(
        kern,
        grid=(bh, l // block_q),
        in_specs=[
            pw_spec, tw_spec, thr_spec, ts_spec,
            pl.BlockSpec((1, block_q, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, dv), lambda i, j: (i, 0, 0)),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l, dv), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, l), jnp.float32)],
        interpret=interpret,
    )(pw, tw, thr, ts, q.reshape(bh, l, dqk), k.reshape(bh, l, dqk), v.reshape(bh, l, dv), maskf)
    return out.reshape(b, h, l, dv)


def _pallas_backward_fused(q, k, v, g, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q, block_k, interpret):
    """Single-pass backward: one pallas_call yields dq, dk, dv + bias partials."""
    b, h, l, dqk = q.shape
    dv = v.shape[-1]
    bh = b * h
    pw, tw, thr = _prep_tables(pos_w, ts_w, cfg)
    maskf = mask[:, None, :].astype(jnp.float32)
    ts = (timestamps.astype(jnp.int32) if has_time else jnp.zeros((b, l), jnp.int32))[:, None, :]
    pw_spec, tw_spec, thr_spec, ts_spec, mask_spec = _common_specs(h, pw.shape[1], tw.shape[1], b, l, block_q)
    qf, kf, vf, gf = (a.reshape(bh, l, -1) for a in (q, k, v, g))
    common = dict(alpha=alpha, inv_n=1.0 / max_seq_len, block_q=block_q, block_k=block_k, max_seq_len=max_seq_len, cfg=cfg, has_time=has_time, n_heads=h)

    n_k = l // block_k
    wp2 = l + block_k
    nbp1 = tw.shape[1]
    nb_lanes = -(-nbp1 // 128) * 128
    dq32, dk, dv_out, dpos_parts, dts_parts = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, **common),
        grid=(bh, n_k),
        in_specs=[
            pw_spec, tw_spec, thr_spec, ts_spec,
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dv), lambda i, j: (i, 0, 0)),
            mask_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),  # dq: revisited across j
            pl.BlockSpec((1, block_k, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 1, wp2), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, nb_lanes), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, dqk), jnp.float32),
            jax.ShapeDtypeStruct((bh, l, dqk), k.dtype),
            jax.ShapeDtypeStruct((bh, l, dv), v.dtype),
            jax.ShapeDtypeStruct((bh, n_k, 1, wp2), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_k, 1, nb_lanes), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, l + block_k - block_q), jnp.float32),  # band
            pltpu.VMEM((1, wp2), jnp.float32),                          # dpos accumulator
        ],
        interpret=interpret,
    )(pw, tw, thr, ts, qf, kf, vf, gf, maskf)

    # assemble bias-table grads from per-k-program partials: window base for
    # block ki is center + ki*block_k - l + 1 (matches the kernel's band base)
    center = max_seq_len - 1
    n_pos = pos_w.shape[0]
    dpos_bh = dpos_parts.reshape(b, h, n_k, wp2).sum(axis=0)  # (H, n_k, wp2)
    buf = jnp.zeros((h, n_pos + wp2), jnp.float32)
    for ki in range(n_k):
        start = center + ki * block_k - l + 1
        buf = jax.lax.dynamic_update_slice(buf, jax.lax.dynamic_slice(buf, (0, start), (h, wp2)) + dpos_bh[:, ki, :], (0, start))
    dpos = buf[:, :n_pos].T  # (n_pos, H)
    # kernel rows are cumulative S(u) = sum(ds * (bucket >= u)); difference
    # adjacent lanes to recover dts[u] = sum(ds * (bucket == u))
    s_cum = dts_parts.reshape(b, h, n_k, nb_lanes).sum(axis=(0, 2))  # (H, nb_lanes)
    dts = (s_cum - jnp.concatenate([s_cum[:, 1:], jnp.zeros((h, 1), jnp.float32)], axis=1))[:, :nbp1].T
    return (dq32.reshape(b, h, l, dqk).astype(q.dtype), dk.reshape(b, h, l, dqk), dv_out.reshape(b, h, l, dv), dpos, dts)


def _pallas_backward_qkv(q, k, v, g, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q, block_k, interpret):
    b, h, l, dqk = q.shape
    dv = v.shape[-1]
    bh = b * h
    pw, tw, thr = _prep_tables(pos_w, ts_w, cfg)
    maskf = mask[:, None, :].astype(jnp.float32)
    ts = (timestamps.astype(jnp.int32) if has_time else jnp.zeros((b, l), jnp.int32))[:, None, :]
    pw_spec, tw_spec, thr_spec, ts_spec, mask_spec = _common_specs(h, pw.shape[1], tw.shape[1], b, l, block_q)
    qf, kf, vf, gf = (a.reshape(bh, l, -1) for a in (q, k, v, g))
    common = dict(alpha=alpha, inv_n=1.0 / max_seq_len, block_q=block_q, block_k=block_k, max_seq_len=max_seq_len, cfg=cfg, has_time=has_time, n_heads=h)

    n_q = l // block_q
    wp = l + block_q
    nbp1 = tw.shape[1]
    nb_lanes = -(-nbp1 // 128) * 128  # lane-major dts row, 128-lane aligned
    dq, dpos_parts, dts_parts = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(bh, n_q),
        in_specs=[
            pw_spec, tw_spec, thr_spec, ts_spec,
            pl.BlockSpec((1, block_q, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l, dv), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, dv), lambda i, j: (i, j, 0)),
            mask_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 1, wp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, nb_lanes), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, dqk), q.dtype),
            jax.ShapeDtypeStruct((bh, n_q, 1, wp), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_q, 1, nb_lanes), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, l), jnp.float32),                 # band
            pltpu.VMEM((1, wp), jnp.float32),                       # dpos accumulator
        ],
        interpret=interpret,
    )(pw, tw, thr, ts, qf, kf, vf, gf, maskf)

    # assemble bias-table grads from per-program partials
    center = max_seq_len - 1
    n_pos = pos_w.shape[0]
    dpos_bh = dpos_parts.reshape(b, h, n_q, wp).sum(axis=0)  # (H, n_q, wp)
    buf = jnp.zeros((h, n_pos + wp), jnp.float32)
    for qi in range(n_q):
        start = center - qi * block_q - (block_q - 1)
        buf = jax.lax.dynamic_update_slice(buf, jax.lax.dynamic_slice(buf, (0, start), (h, wp)) + dpos_bh[:, qi, :], (0, start))
    dpos = buf[:, :n_pos].T  # (n_pos, H)
    dts = dts_parts.reshape(b, h, n_q, nb_lanes).sum(axis=(0, 2))[:, :nbp1].T  # (nb+1, H)

    dk, dv_out = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(bh, l // block_k),
        in_specs=[
            pw_spec, tw_spec, thr_spec, ts_spec,
            pl.BlockSpec((1, l, dqk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l, dv), lambda i, j: (i, 0, 0)),
            mask_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dqk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, dv), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, l, dqk), k.dtype),
            jax.ShapeDtypeStruct((bh, l, dv), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_q, l + block_k - block_q), jnp.float32)],
        interpret=interpret,
    )(pw, tw, thr, ts, qf, kf, vf, gf, maskf)

    return (dq.reshape(b, h, l, dqk), dk.reshape(b, h, l, dqk), dv_out.reshape(b, h, l, dv), dpos, dts)


# ---------------------------------------------------------------------------
# bias-table gradients: XLA chunked scan (O(block_q * L) memory)
# ---------------------------------------------------------------------------

def _skew_diag_sums(ds_chunk, q0, l, max_seq_len):
    """Sum ``ds[l_row, m]`` into position-table slots ``m - l_row + maxL - 1``.

    ds_chunk: (B, H, bq, L).  Row-flip then the pad-flatten-reshape skew:
    ``skew[i', c] = flipped[i', c - i'] = ds[bq-1-i', c-i']`` so column ``c``
    collects exactly the elements with ``m - i = c - (bq-1)`` — one diagonal
    per column, summed densely (no gather/scatter).  Returns (n_pos, H).
    """
    b, h, bq, _ = ds_chunk.shape
    x = jnp.flip(ds_chunk, axis=2)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, bq)))  # (B,H,bq,L+bq)
    flat = x.reshape(b, h, bq * (l + bq))[:, :, : bq * (l + bq - 1)]
    skew = flat.reshape(b, h, bq, l + bq - 1)
    col_sums = jnp.sum(skew, axis=(0, 2))  # (H, L+bq-1); col c ↔ rel offset c-(bq-1)
    n_pos = 2 * max_seq_len - 1
    # global slot for col c: (c - (bq-1)) - q0 + (maxL - 1)
    start = max_seq_len - bq - q0
    dpos = jnp.zeros((h, n_pos), jnp.float32)
    dpos = jax.lax.dynamic_update_slice(dpos, col_sums, (0, start))
    return dpos.T  # (n_pos, H)


def _bias_table_grads(q, k, v, g, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q):
    """dpos_w, dts_w via a scan over query chunks; ds recomputed per chunk."""
    b, h, l, dqk = q.shape
    inv_n = 1.0 / max_seq_len
    n_chunks = l // block_q
    nbp1 = ts_w.shape[0]
    maskb = mask[:, None, None, :]  # (B,1,1,L)
    pos = jnp.arange(l)

    def chunk(carry, qi):
        dpos, dts = carry
        q0 = qi * block_q
        q_blk = jax.lax.dynamic_slice_in_dim(q, q0, block_q, axis=2)
        g_blk = jax.lax.dynamic_slice_in_dim(g, q0, block_q, axis=2)
        s = jnp.einsum("bhld,bhmd->bhlm", q_blk, k) * alpha  # (B,H,bq,L)
        rel = pos[None, :] - (q0 + jnp.arange(block_q))[:, None] + (max_seq_len - 1)
        s = s + jnp.transpose(pos_w[rel], (2, 0, 1))[None]
        if has_time:
            tq = jax.lax.dynamic_slice_in_dim(timestamps, q0, block_q, axis=1)
            buckets = _bucketize(tq[:, :, None] - timestamps[:, None, :], cfg)  # (B,bq,L)
            s = s + jnp.transpose(ts_w[buckets], (0, 3, 1, 2))
        q_pos = (q0 + jnp.arange(block_q))[:, None]
        valid = (pos[None, :] <= q_pos)[None, None] & maskb
        s = jnp.where(valid, s, -1e4)
        dattn = jnp.einsum("bhld,bhmd->bhlm", g_blk, v)
        ds = jnp.where(valid, dattn * _dsilu(s) * inv_n, 0.0)
        dpos = dpos + _skew_diag_sums(ds, q0, l, max_seq_len)
        if has_time:
            onehot = jax.nn.one_hot(buckets, nbp1, dtype=jnp.float32)  # (B,bq,L,nb+1)
            dts = dts + jnp.einsum("bhlm,blmu->uh", ds, onehot)
        return (dpos, dts), None

    init = (jnp.zeros_like(pos_w), jnp.zeros_like(ts_w))
    (dpos, dts), _ = jax.lax.scan(chunk, init, jnp.arange(n_chunks))
    return dpos, dts


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _should_use_pallas(l, padding_mask, block_q, block_k):
    shapes_ok = _HAS_PALLAS and l % block_q == 0 and l % block_k == 0 and block_k % block_q == 0 and padding_mask is not None and l >= block_q
    if _FORCE_INTERPRET[0]:
        return shapes_ok
    return shapes_ok and jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def hstu_attention_rab(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, block_q=128, block_k=128):
    """Fused HSTU attention with on-the-fly rab^{p,t} bias.

    Args:
        q, k: ``(B, H, L, dqk)``; v: ``(B, H, L, dv)``.
        pos_w: ``(2*max_seq_len-1, H)`` position table.
        ts_w: ``(num_buckets+1, H)`` time-bucket table.
        timestamps: ``(B, L)`` int per-position times, or None (position-only).
        padding_mask: ``(B, L)`` bool, True = valid key (static argnum).
        alpha / max_seq_len / cfg (BucketCfg) / block sizes: static.

    Returns ``(B, H, L, dv)``.  O(L) memory in fwd AND bwd on the pallas path.
    """
    return _fwd_impl(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, block_q, block_k)


def _fwd_impl(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, block_q, block_k):
    l = q.shape[2]
    has_time = timestamps is not None
    if not _should_use_pallas(l, padding_mask, block_q, block_k):
        return _dense_forward(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, has_time)
    mask = padding_mask
    return _pallas_forward(q, k, v, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q, block_k, _FORCE_INTERPRET[0])


def _rab_fwd(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, block_q, block_k):
    out = _fwd_impl(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, block_q, block_k)
    return out, (q, k, v, pos_w, ts_w, timestamps, padding_mask)


def _rab_bwd(alpha, max_seq_len, cfg, block_q, block_k, residuals, g):
    q, k, v, pos_w, ts_w, timestamps, padding_mask = residuals
    l = q.shape[2]
    has_time = timestamps is not None
    if not _should_use_pallas(l, padding_mask, block_q, block_k):
        def f(q, k, v, pos_w, ts_w):
            return _dense_forward(q, k, v, pos_w, ts_w, timestamps, padding_mask, alpha, max_seq_len, cfg, has_time)

        _, vjp = jax.vjp(f, q, k, v, pos_w, ts_w)
        dq, dk, dv, dpos, dts = vjp(g)
        return dq, dk, dv, dpos, dts, None, None

    mask = padding_mask
    bwd = _pallas_backward_fused if _FUSED_BWD[0] else _pallas_backward_qkv
    dq, dk, dv, dpos, dts = bwd(q, k, v, g, pos_w, ts_w, timestamps, mask, alpha, max_seq_len, cfg, has_time, block_q, block_k, _FORCE_INTERPRET[0])
    return dq, dk, dv, dpos, dts, None, None


hstu_attention_rab.defvjp(_rab_fwd, _rab_bwd)
