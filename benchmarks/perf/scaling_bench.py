"""Weak-scaling: examples/s vs data-parallel mesh size (fixed per-device batch).

Runs DeepFM CTR training on a (data, 1) mesh of 1/2/4/8 devices with a fixed
per-device batch, measuring examples/s and scaling efficiency vs the 1-device
run.  On the virtual CPU mesh (default test environment) this validates the
SPMD path's overhead scaling — all "devices" share host cores, so efficiency
there is a LOWER bound for real chips over ICI; on a real multi-chip slice it
is the BASELINE.json scaling-efficiency metric itself (>=85% at 2 hosts).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/perf/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

# default: the virtual CPU mesh (sharding-overhead validation).  Set
# SCALING_BENCH_TPU=1 to run on whatever real chips jax exposes instead.
if not os.environ.get("SCALING_BENCH_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.parallel import create_mesh
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import DeviceCachedLoader

PER_DEVICE_BATCH = 1024
N_SPARSE, N_DENSE, VOCAB, DIM = 26, 13, 10000, 16
STEPS = 64


def run(n_data: int):
    batch = PER_DEVICE_BATCH * n_data
    n = STEPS * batch
    rng = np.random.default_rng(0)
    x = {f"C{i}": rng.integers(0, VOCAB, n).astype(np.int32) for i in range(N_SPARSE)}
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(N_DENSE)})
    y = rng.integers(0, 2, n).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=VOCAB, embed_dim=DIM) for i in range(N_SPARSE))
    dense = tuple(DenseFeature(f"I{i}") for i in range(N_DENSE))
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (256, 128), "dropout": 0.0})
    mesh = create_mesh(data=n_data, model=1, devices=jax.devices()[:n_data]) if n_data > 1 else None
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/scaling_bench", steps_per_call=16, mesh=mesh)
    loader = DeviceCachedLoader(x, y, batch_size=batch, group_size=16, mesh=mesh)
    trainer.train_one_epoch(loader, log_interval=0)  # compile + warmup
    repeats = int(os.environ.get("SCALING_BENCH_REPEATS", "5"))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        trainer.train_one_epoch(loader, log_interval=0)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return n / med, (max(times) - min(times)) / med


def main():
    print(f"# backend={jax.default_backend()} devices={jax.device_count()}", flush=True)
    sizes = [s for s in (1, 2, 4, 8) if s <= jax.device_count()]
    base = None
    for s in sizes:
        eps, spread = run(s)
        if base is None:
            base = eps
        eff = eps / (base * s)
        print(json.dumps({"data_parallel": s, "examples_per_s": round(eps, 0), "per_device": round(eps / s, 0), "efficiency_vs_1dev": round(eff, 3), "spread": round(spread, 3)}), flush=True)


if __name__ == "__main__":
    main()
