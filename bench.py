"""Headline benchmarks: DeepFM CTR training throughput (examples/s/chip).

Two configs, two JSON lines (the driver parses the LAST line):

1. ``deepfm_criteo_full_embedding_examples_per_s_chip`` — **production
   embedding path**: Criteo-full-shaped power-law vocabs (3 tables >= 1M
   rows, 8.45M fused rows total), ``fused="auto"`` layout (large tables in
   one fused (ΣV, D) param, small ones per-feature), **row-wise Adagrad
   sparse updates** for the fused tables (``ops/sparse_update.py``) and
   zipf-distributed fresh ids every step.  This is the config the sharded/
   sparse embedding engine exists for.
2. ``deepfm_criteo_train_examples_per_s_chip`` — small-table config (26 x
   10k-row tables, all per-feature under the auto layout): measures the
   small-table fast path; kept as the historical headline.

Honest methodology (round-2 rework):
- streams FRESH batches through the real trainer path (`train_one_epoch` →
  host batch groups → `prefetch_to_device` → donated scan steps), no batch
  replay, input pipeline included;
- synchronizes via the epoch-loss host transfer (the axon transport's
  `block_until_ready` can return early, so timing relies on data-dependent
  device->host reads);
- reports the MEDIAN over epochs; spread (max-min)/median is printed to
  stderr together with an arithmetic FLOPs/MFU estimate.

``vs_baseline`` compares each config against the reference torch-rechub
DeepFM on this container's CPU at the SAME table geometry (measured with
`/tmp/ref_bench.py` ≈ 14,380.7 ex/s for the small config and
`/tmp/ref_bench_full.py` for the Criteo-full-shaped config — see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_EXAMPLES_PER_S = 14380.7  # torch-rechub DeepFM, torch CPU, small tables
REFERENCE_FULL_EXAMPLES_PER_S = 3099.4  # same, Criteo-full-shaped vocabs (idle-machine median, see BASELINE.md)

B, N_SPARSE, N_DENSE, VOCAB, DIM = 4096, 26, 13, 10000, 16
N_BATCHES = 256  # fresh examples per epoch = N_BATCHES * B ≈ 1.05M — longer epochs (sub-second ones made the spread hostage to transient host jitter) AND an exact multiple of the 64-step scan group (a partial tail group measurably slows the epoch)
EPOCHS = 7  # median over these
V5E_BF16_PEAK = 197e12

# Criteo-full-shaped geometry: power-law vocabs, 3 tables >= 1M rows.  Under
# the "auto" layout the 6 tables >= 262144 rows fuse into one (8.45M, 16)
# param (row-shardable, sparse-updatable); the other 20 stay per-feature.
VOCABS_FULL = [4_000_000, 2_000_000, 1_000_000, 500_000, 300_000, 300_000, 200_000, 100_000, 50_000, 50_000] + [10_000] * 16


def deepfm_flops_per_example(n_sparse=N_SPARSE) -> float:
    """Arithmetic fwd+bwd FLOPs per example for this DeepFM config."""
    d_in = n_sparse * DIM + N_DENSE
    mlp = d_in * 256 + 256 * 128 + 128 * 1
    fm = n_sparse * DIM * 2  # sum/square-sum interaction
    fwd = 2 * mlp + fm
    return 3.0 * fwd  # bwd ≈ 2x fwd


def _run_epochs(trainer, loader, n):
    trainer.train_one_epoch(loader, log_interval=0)  # compile + warmup epoch
    times = []
    for _ in range(EPOCHS):
        t0 = time.perf_counter()
        trainer.train_one_epoch(loader, log_interval=0)  # returns host float (sync)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    # interquartile spread: robust to a single jittery epoch (the tunnel/host
    # occasionally stalls one epoch by >10%, which made max-min misleading)
    q25, q75 = np.percentile(times, [25, 75])
    return n / med, float((q75 - q25) / med)


def bench_small():
    """Small-table config (historical headline)."""
    from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DeepFM
    from torch_rechub_tpu.trainers.ctr_trainer import CTRTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader, DeviceCachedLoader

    rng = np.random.default_rng(0)
    n = N_BATCHES * B
    x = {f"C{i}": rng.integers(0, VOCAB, n).astype(np.int32) for i in range(N_SPARSE)}
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(N_DENSE)})
    y = rng.integers(0, 2, n).astype(np.float32)

    sparse = tuple(SparseFeature(f"C{i}", vocab_size=VOCAB, embed_dim=DIM) for i in range(N_SPARSE))
    dense = tuple(DenseFeature(f"I{i}") for i in range(N_DENSE))
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (256, 128), "dropout": 0.0, "activation": "relu"})
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/bench_model", steps_per_call=64)

    # host-streamed pipeline (fresh uploads each step, prefetch overlap)
    streamed_eps, streamed_spread = _run_epochs(trainer, ArrayLoader(x, y, batch_size=B, shuffle=False), n)
    # device-resident dataset (one upfront upload, fresh batch every step)
    cached_eps, spread = _run_epochs(trainer, DeviceCachedLoader(x, y, batch_size=B, group_size=64), n)
    print(f"# host-streamed: {streamed_eps:,.0f} ex/s (spread {streamed_spread:.1%}) — bounded by H2D over the device transport", file=sys.stderr)

    flops = cached_eps * deepfm_flops_per_example()
    print(
        f"# small-table config: device-cached dataset; median over {EPOCHS} epochs of {n} fresh examples; spread {spread:.1%}; "
        f"~{flops / 1e12:.2f} TFLOP/s ≈ {flops / V5E_BF16_PEAK:.2%} of v5e bf16 peak "
        f"(f32 model, embedding+input-bound workload)",
        file=sys.stderr,
    )

    # bf16 variant — measured justification for the f32 default on this
    # config (embedding/input-bound: the MXU fraction bf16 accelerates is
    # small here; see docs/PRECISION.md)
    trainer_bf16 = CTRTrainer(model, n_epoch=1, model_path="/tmp/bench_model_bf16", steps_per_call=64, precision="bf16")
    bf16_eps, bf16_spread = _run_epochs(trainer_bf16, DeviceCachedLoader(x, y, batch_size=B, group_size=64), n)
    print(
        f"# small-table config bf16: {bf16_eps:,.0f} ex/s (spread {bf16_spread:.1%}) vs f32 {cached_eps:,.0f} "
        f"({(bf16_eps / cached_eps - 1):+.1%}) — f32 stays the default headline",
        file=sys.stderr,
    )
    return cached_eps, spread


def bench_criteo_full():
    """Production embedding path: power-law vocabs, fused layout, sparse Adagrad."""
    from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DeepFM
    from torch_rechub_tpu.trainers.ctr_trainer import CTRTrainer
    from torch_rechub_tpu.utils.data import DeviceCachedLoader

    rng = np.random.default_rng(0)
    n = N_BATCHES * B
    x = {}
    for i, v in enumerate(VOCABS_FULL):
        # zipf-distributed ids: heavy head, long tail — the access pattern the
        # row-wise sparse updates + dedup are designed for
        x[f"C{i}"] = (rng.zipf(1.2, n) % v).astype(np.int32)
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(N_DENSE)})
    y = rng.integers(0, 2, n).astype(np.float32)

    sparse = tuple(SparseFeature(f"C{i}", vocab_size=v, embed_dim=DIM) for i, v in enumerate(VOCABS_FULL))
    dense = tuple(DenseFeature(f"I{i}") for i in range(N_DENSE))
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (256, 128), "dropout": 0.0, "activation": "relu"})
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/bench_model_full", steps_per_call=64, sparse_embedding="adagrad")

    eps, spread = _run_epochs(trainer, DeviceCachedLoader(x, y, batch_size=B, group_size=64), n)
    fused_rows = sum(v for v in VOCABS_FULL if v >= 262144)
    print(
        f"# criteo-full config: {len(VOCABS_FULL)} tables, {fused_rows / 1e6:.2f}M fused rows "
        f"(+{sum(v for v in VOCABS_FULL if v < 262144) / 1e3:.0f}k per-feature rows), row-wise Adagrad sparse "
        f"updates, fresh zipf ids; median over {EPOCHS} epochs of {n} examples; spread {spread:.1%}",
        file=sys.stderr,
    )
    return eps, spread


def main():
    full_eps, full_spread = bench_criteo_full()
    print(json.dumps({
        "metric": "deepfm_criteo_full_embedding_examples_per_s_chip",
        "value": round(full_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(full_eps / REFERENCE_FULL_EXAMPLES_PER_S, 3),
        "spread": round(full_spread, 4),
    }))
    small_eps, small_spread = bench_small()
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_s_chip",
        "value": round(small_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(small_eps / REFERENCE_EXAMPLES_PER_S, 3),
        "spread": round(small_spread, 4),
    }))


if __name__ == "__main__":
    main()
