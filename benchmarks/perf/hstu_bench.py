"""HSTU attention benchmark: fused on-the-fly-rab Pallas kernels vs dense XLA.

Measures fwd+bwd wall time of the attention op (the model's O(L^2) hot loop,
reference Eq.3 ``torch_rechub/basic/layers.py:892-916``) at training shapes,
on the real chip, with data-dependent sync.  Also verifies numerics vs the
dense path at each shape.

Usage: python benchmarks/perf/hstu_bench.py [--check-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from torch_rechub_tpu.ops.pallas.hstu_rab_attention import BucketCfg, _dense_forward, hstu_attention_rab

CFG = BucketCfg(num_buckets=128, fn="sqrt", divisor=1.0, unit="minutes")


def make_inputs(b, h, l, dqk, dv, maxl, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, l, dqk)).astype(np.float32), dtype) * 0.3
    k = jnp.asarray(rng.normal(size=(b, h, l, dqk)).astype(np.float32), dtype) * 0.3
    v = jnp.asarray(rng.normal(size=(b, h, l, dv)).astype(np.float32), dtype) * 0.3
    pos_w = jnp.asarray(rng.normal(size=(2 * maxl - 1, h)).astype(np.float32)) * 0.1
    ts_w = jnp.asarray(rng.normal(size=(CFG.num_buckets + 1, h)).astype(np.float32)) * 0.1
    ts = jnp.asarray(np.sort(rng.integers(0, 30_000_000, (b, l)), axis=1).astype(np.int32))
    lens = rng.integers(l // 2, l + 1, b)
    mask = jnp.asarray((np.arange(l)[None, :] < lens[:, None]))
    return q, k, v, pos_w, ts_w, ts, mask


V5E_BF16_PEAK = 197e12


def attention_train_flops(b, h, l, dqk, dv):
    """Arithmetic fwd+bwd matmul FLOPs of the causal silu attention.

    Nine L x L matmuls per (batch, head) — fwd: QK^T, PV; bwd dq: score
    recompute, dattn = g V^T, dq = ds K; bwd dkv: score recompute, dattn,
    dv = attn^T g, dk = ds^T q — each 2 * (L^2/2 causal) * d FLOPs.
    """
    per_mm = l * l * 0.5 * 2  # causal half, 2 FLOPs per MAC
    return b * h * per_mm * (2 * dqk + 1 * dv          # fwd
                             + 2 * dqk + 1 * dv        # dq pass
                             + 2 * dqk + 2 * dv)       # dkv pass


def bench_shape(b, h, l, dqk, dv, maxl, steps=20, check=True, dtype=jnp.float32):
    q, k, v, pos_w, ts_w, ts, mask = make_inputs(b, h, l, dqk, dv, maxl, dtype=dtype)
    alpha = 1.0 / np.sqrt(dqk)

    block_k = 256 if l >= 2048 and l % 256 == 0 else 128  # round-4 sweep

    def loss_fused(q, k, v, pos_w, ts_w):
        out = hstu_attention_rab(q, k, v, pos_w, ts_w, ts, mask, alpha, maxl, CFG, 128, block_k)
        return jnp.sum(out * out)

    def loss_dense(q, k, v, pos_w, ts_w):
        out = _dense_forward(q, k, v, pos_w, ts_w, ts, mask, alpha, maxl, CFG, True)
        return jnp.sum(out * out)

    results = {}
    for name, fn in (("dense_xla", loss_dense), ("pallas_rab", loss_fused)):
        vg = jax.value_and_grad(fn, argnums=(0, 1, 2, 3, 4))

        # device-side scan: `steps` fwd+bwd per dispatch, so the measurement
        # excludes the per-call host->device tunnel RTT (~25ms on axon, which
        # used to dominate the small shapes); grads fold back into the inputs
        # to serialize iterations.
        @jax.jit
        def run(q, k, v, pos_w, ts_w):
            def body(carry, _):
                loss, grads = vg(*carry)
                new = tuple(c + 0.0 * gg for c, gg in zip(carry, grads))
                return new, loss
            carry, losses = jax.lax.scan(body, (q, k, v, pos_w, ts_w), None, length=steps)
            return jnp.sum(losses) + sum(jnp.sum(c[..., 0]) for c in carry)

        try:
            _ = float(run(q, k, v, pos_w, ts_w))
        except Exception as e:
            results[name] = {"error": str(e)[:120]}
            continue
        t0 = time.perf_counter()
        _ = float(run(q, k, v, pos_w, ts_w))
        dt = (time.perf_counter() - t0) / steps
        tokens_per_s = b * l / dt
        mfu = attention_train_flops(b, h, l, dqk, dv) / dt / V5E_BF16_PEAK
        results[name] = {"ms": round(dt * 1e3, 2), "tokens_per_s": round(tokens_per_s / 1e3, 1), "mfu_vs_bf16_peak": round(mfu, 4)}
        if check and name == "pallas_rab" and "error" not in results["dense_xla"]:
            lf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 3, 4)))(q, k, v, pos_w, ts_w)
            ld, gd = jax.jit(jax.value_and_grad(loss_dense, argnums=(0, 3, 4)))(q, k, v, pos_w, ts_w)
            rtol, atol = (1e-3, 3e-4) if dtype == jnp.float32 else (4e-2, 4e-3)
            ok = np.allclose(float(lf), float(ld), rtol=max(rtol, 1e-3))
            for a, bb in zip(gf, gd):
                ok = ok and np.allclose(np.asarray(a, np.float32), np.asarray(bb, np.float32), rtol=3 * rtol, atol=atol)
            results[name]["numerics_ok"] = bool(ok)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--precision", choices=["f32", "bf16"], default="f32")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    print(f"# backend={jax.default_backend()} precision={args.precision}", flush=True)
    shapes = [
        # (B, H, L, dqk, dv, maxL)
        (8, 8, 256, 64, 64, 256),
        (4, 8, 1024, 64, 64, 1024),
        (2, 8, 2048, 64, 64, 2048),
        (16, 8, 2048, 64, 64, 2048),  # dense XLA OOMs here; pallas is O(L) memory
    ]
    for b, h, l, dqk, dv, maxl in shapes:
        r = bench_shape(b, h, l, dqk, dv, maxl, steps=5 if args.check_only else 20, dtype=dtype)
        speed = None
        if "ms" in r.get("dense_xla", {}) and "ms" in r.get("pallas_rab", {}):
            speed = round(r["dense_xla"]["ms"] / r["pallas_rab"]["ms"], 2)
        print(json.dumps({"shape": f"B{b}xL{l}", **{k2: v for k2, v in r.items()}, "speedup": speed}), flush=True)


if __name__ == "__main__":
    main()
