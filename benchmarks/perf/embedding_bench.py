"""Embedding lookup/scatter-grad throughput: fused vs per-feature tables.

Measures the VERDICT round-1 ask: lookup throughput at realistic vocab sizes
(26 tables x 1M rows x D16, Criteo-full scale), fresh random ids every step,
forward + backward (scatter-add into the tables via SGD), on the real chip.

Method: one jitted fn runs SCAN_N steps via lax.scan; ids are drawn on-device
per step (fold_in'd rng) so there is no host->device traffic and no repeated
cached rows.  Each step does lookup -> weighted-sum loss -> grad -> sgd update,
i.e. one gather + one scatter-add per table layout.

Usage: python benchmarks/perf/embedding_bench.py [--vocab 1000000] [--tables 26]
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

from torch_rechub_tpu.basic.features import SparseFeature
from torch_rechub_tpu.ops.embedding import EmbeddingCollection


def bench_layout(fused: bool, n_tables: int, vocab: int, dim: int, batch: int, scan_n: int, windows: int = 5):
    feats = tuple(SparseFeature(f"C{i}", vocab_size=vocab, embed_dim=dim) for i in range(n_tables))
    coll = EmbeddingCollection(features=feats, fused=fused)
    x0 = {f"C{i}": jnp.zeros((batch,), jnp.int32) for i in range(n_tables)}
    t_init = time.perf_counter()
    params = coll.init(jax.random.PRNGKey(0), x0, feats)["params"]
    jax.block_until_ready(params)
    print(f"#   init {time.perf_counter() - t_init:.1f}s", flush=True)

    def one_step(params, key):
        ids = jax.random.randint(key, (n_tables, batch), 0, vocab, jnp.int32)
        x = {f"C{i}": ids[i] for i in range(n_tables)}

        def loss_fn(p):
            emb = coll.apply({"params": p}, x, feats)  # (B, F, D)
            return jnp.sum(emb * emb)

        grads = jax.grad(loss_fn)(params)
        return jax.tree_util.tree_map(lambda w, g: w - 1e-3 * g, params, grads), 0.0

    @jax.jit
    def run(params, key):
        keys = jax.random.split(key, scan_n)
        params, _ = jax.lax.scan(lambda p, k: one_step(p, k), params, keys)
        return params

    def sync(p):
        # device->host scalar fetch: forces completion even if the transport's
        # block_until_ready is a no-op (observed on the axon tunnel)
        leaf = jax.tree_util.tree_leaves(p)[0]
        return float(jnp.sum(leaf[0]))

    t_c = time.perf_counter()
    params = run(params, jax.random.PRNGKey(1))  # compile + warmup
    sync(params)
    print(f"#   compile+warmup {time.perf_counter() - t_c:.1f}s", flush=True)

    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        params = run(params, jax.random.PRNGKey(2 + w))
        sync(params)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med
    lookups_per_s = scan_n * batch * n_tables / med
    # bytes: fwd gather read + bwd scatter read-modify-write of the same rows
    bytes_per_lookup = dim * 4 * 3
    gbps = lookups_per_s * bytes_per_lookup / 1e9
    return {
        "layout": "fused" if fused else "per-feature",
        "lookups_per_s": round(lookups_per_s / 1e6, 2),
        "unit": "M lookups/s",
        "effective_gbps": round(gbps, 1),
        "median_s": round(med, 4),
        "spread": round(spread, 3),
    }


def bench_sparse(method: str, n_tables: int, vocab: int, dim: int, batch: int, scan_n: int, windows: int = 5):
    """Fused table + row-wise sparse update (the production path): per-step
    cost is O(batch * dim), independent of vocab size."""
    from torch_rechub_tpu.ops.sparse_update import rowwise_adagrad_update, sparse_sgd_update

    rows = (n_tables * vocab // 64 + 1) * 64
    key0 = jax.random.PRNGKey(0)
    table = jax.random.normal(key0, (rows, dim), jnp.float32) * 1e-4
    accum = jnp.zeros((rows,), jnp.float32)
    n_ids = n_tables * batch

    def one_step(carry, key):
        table, accum = carry
        ids = jax.random.randint(key, (n_ids,), 0, n_tables * vocab, jnp.int32)
        demb = jax.grad(lambda rows: jnp.sum(rows * rows))(jnp.take(table, ids, axis=0))
        if method == "sgd":
            table = sparse_sgd_update(table, ids, demb, 1e-3)
        else:
            table, accum = rowwise_adagrad_update(table, accum, ids, demb, 1e-3)
        return (table, accum), 0.0

    @jax.jit
    def run(carry, key):
        keys = jax.random.split(key, scan_n)
        carry, _ = jax.lax.scan(one_step, carry, keys)
        return carry

    def sync(c):
        return float(jnp.sum(c[0][0]))

    carry = run((table, accum), jax.random.PRNGKey(1))
    sync(carry)
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        carry = run(carry, jax.random.PRNGKey(2 + w))
        sync(carry)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    lookups_per_s = scan_n * n_ids / med
    return {
        "layout": f"fused+sparse-{method}",
        "lookups_per_s": round(lookups_per_s / 1e6, 2),
        "unit": "M lookups/s",
        "effective_gbps": round(lookups_per_s * dim * 4 * 3 / 1e9, 1),
        "median_s": round(med, 4),
        "spread": round((max(times) - min(times)) / med, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--scan_n", type=int, default=16)
    args = ap.parse_args()

    print(f"# backend={jax.default_backend()} devices={jax.devices()}")
    results = []
    for fused in (False, True):
        r = bench_layout(fused, args.tables, args.vocab, args.dim, args.batch, args.scan_n)
        results.append(r)
        print(json.dumps(r), flush=True)
    for method in ("sgd", "adagrad"):
        r = bench_sparse(method, args.tables, args.vocab, args.dim, args.batch, args.scan_n)
        results.append(r)
        print(json.dumps(r), flush=True)
    speedup = results[2]["lookups_per_s"] / results[0]["lookups_per_s"]
    print(json.dumps({"metric": "sparse_vs_dense_perfeature_speedup", "value": round(speedup, 3)}))


if __name__ == "__main__":
    main()
