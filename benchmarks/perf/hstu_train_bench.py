"""HSTU end-to-end TRAINING throughput (tokens/s) through SeqTrainer.

Complements ``hstu_bench.py`` (attention-op microbenchmark) with the number
that matters for the generative family: full train-step tokens/s — embedding,
N HSTU layers (Pallas rab attention), chunked large-vocab CE, Adam — on fresh
batches, timed device-side via the epoch-loss host read.

Usage: python benchmarks/perf/hstu_train_bench.py [--steps-per-call 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


V5E_BF16_PEAK = 197e12


def hstu_train_flops_per_token(l, vocab, d_model, n_layers, n_heads):
    """Arithmetic fwd+bwd matmul FLOPs per token for the full train step.

    Per layer: proj1 (d -> 2h(dqk+dv)) + proj2 (h*dv -> d) at 3x fwd cost
    (bwd = 2x fwd), attention = 9 causal LxL matmuls of width dqk|dv (see
    hstu_bench.attention_train_flops).  Output CE: the (B*L, d) @ (d, V)
    logits matmul at 4x fwd cost (fwd + checkpointed recompute + dHidden +
    dWeight).  Embedding gathers/LN/elementwise excluded (not MXU work).
    """
    dqk = dv = d_model // n_heads
    proj = 2 * d_model * (2 * n_heads * (dqk + dv)) + 2 * (n_heads * dv) * d_model
    attn = 0.5 * l * 2 * n_heads * (5 * dqk + 4 * dv)  # 9 matmuls, causal half
    ce = 2 * d_model * vocab
    return n_layers * (3 * proj + attn) + 4 * ce


def bench(b, l, vocab, d_model, n_layers, steps_per_call, n_batches=32, epochs=3, precision=None):
    import jax

    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(0)
    n = n_batches * b
    tokens = rng.integers(1, vocab, (n, l)).astype(np.int32)
    positions = np.broadcast_to(np.arange(l, dtype=np.int32), (n, l)).copy()
    time_diffs = np.sort(rng.integers(0, 10**6, (n, l)), axis=1).astype(np.int32)
    targets = rng.integers(1, vocab, n).astype(np.int32)

    model = HSTUModel(vocab_size=vocab, d_model=d_model, n_heads=8, n_layers=n_layers, dqk=d_model // 8, dv=d_model // 8, max_seq_len=l, dropout=0.0)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/hstu_train_bench", steps_per_call=steps_per_call, vocab_chunk_size=min(vocab, 8192), precision=precision)
    loader = SeqLoader(tokens, positions, targets, time_diffs, batch_size=b, shuffle=False)

    trainer.train_one_epoch(loader, log_interval=0)  # compile + warmup
    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        trainer.train_one_epoch(loader, log_interval=0)  # epoch loss = host sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med
    tokens_per_s = n * l / med
    mfu = tokens_per_s * hstu_train_flops_per_token(l, vocab, d_model, n_layers, 8) / V5E_BF16_PEAK
    return {
        "shape": f"B{b}xL{l}",
        "vocab": vocab,
        "d_model": d_model,
        "n_layers": n_layers,
        "precision": precision or "f32",
        "tokens_per_s": round(tokens_per_s),
        "ms_per_step": round(med / n_batches * 1e3, 2),
        "spread": round(spread, 3),
        "mfu_vs_bf16_peak": round(mfu, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--precision", choices=["f32", "bf16"], default=None)
    args = ap.parse_args()
    import jax

    print(f"# backend={jax.default_backend()}", flush=True)
    shapes = [
        # (B, L, vocab, d_model, n_layers)
        (8, 256, 40000, 256, 4),
        (8, 1024, 40000, 256, 4),
    ]
    if args.quick:
        shapes = shapes[:1]
    for b, l, vocab, d_model, n_layers in shapes:
        print(json.dumps(bench(b, l, vocab, d_model, n_layers, args.steps_per_call, precision=None if args.precision == "f32" else args.precision)), flush=True)


if __name__ == "__main__":
    main()
