"""bf16 vs f32 quality parity, seed-level (VERDICT r3 item 1 acceptance).

Trains the same learnable synthetic configs under ``precision=None`` (f32)
and ``precision="bf16"`` across seeds and prints AUC / hit@1 side by side:

- DeepFM CTR on parity-structured data (label = f(C0 parity + I0));
- HSTU next-item on first-order-Markov sequences (the same generator as
  ``run_parity_hstu.py``'s ours-vs-reference comparison).

Quality claim: per-seed deltas within run-to-run variance.  Runs on CPU by
default (dtype semantics are identical to TPU; only speed differs):
``JAX_PLATFORMS=cpu python benchmarks/parity/run_parity_bf16.py``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # for run_parity_hstu import

import numpy as np

SEEDS = (0, 1, 2)


def deepfm_auc(seed: int, precision):
    from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DeepFM
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import DataGenerator

    rng = np.random.default_rng(seed)
    n = 8192
    x = {f"C{i}": rng.integers(0, 64, n).astype(np.int32) for i in range(5)}
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(3)})
    logit = (x["C0"] % 2) * 2.0 - 1.0 + 1.5 * x["I0"]
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    sparse = tuple(SparseFeature(f"C{i}", vocab_size=64, embed_dim=8) for i in range(5))
    dense = tuple(DenseFeature(f"I{i}") for i in range(3))
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (32,), "dropout": 0.0, "activation": "relu"})
    tr, va, te = DataGenerator(x, y, seed=seed).generate_dataloader(split_ratio=[0.7, 0.1], batch_size=512)
    t = CTRTrainer(model, n_epoch=4, model_path=f"/tmp/bf16_parity_{seed}_{precision}", precision=precision, seed=seed)
    t.fit(tr, None, log_interval=0)
    return float(t.evaluate(model, te))


def hstu_hit1(seed: int, precision):
    """Same Markov generator + HSTU hyperparameters as run_parity_hstu.py
    (the ours-vs-reference comparison) — 3 successors/item, hit@1 ~0.3."""
    from run_parity_hstu import HP, VOCAB, markov_sequences

    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    (toks, pos, targets, tds), (toks_t, pos_t, targets_t, tds_t) = markov_sequences(seed)
    model = HSTUModel(vocab_size=VOCAB, **HP)
    trainer = SeqTrainer(model, optimizer_params={"lr": 3e-3, "weight_decay": 1e-2}, n_epoch=8, model_path=f"/tmp/bf16_parity_hstu_{seed}_{precision}", precision=precision, seed=seed)
    train = SeqLoader(toks, pos, targets, tds, batch_size=64, shuffle=True, seed=seed)
    test = SeqLoader(toks_t, pos_t, targets_t, tds_t, batch_size=64)
    trainer.fit(train)
    _, hit1 = trainer.evaluate(test)
    return float(hit1)


def main():
    rows = []
    for seed in SEEDS:
        a32 = deepfm_auc(seed, None)
        a16 = deepfm_auc(seed, "bf16")
        rows.append({"config": "deepfm_auc", "seed": seed, "f32": round(a32, 4), "bf16": round(a16, 4), "delta": round(a16 - a32, 4)})
        print(json.dumps(rows[-1]), flush=True)
    for seed in SEEDS:
        h32 = hstu_hit1(seed, None)
        h16 = hstu_hit1(seed, "bf16")
        rows.append({"config": "hstu_hit1", "seed": seed, "f32": round(h32, 4), "bf16": round(h16, 4), "delta": round(h16 - h32, 4)})
        print(json.dumps(rows[-1]), flush=True)
    for cfg in ("deepfm_auc", "hstu_hit1"):
        sel = [r for r in rows if r["config"] == cfg]
        print(json.dumps({"config": cfg, "mean_f32": round(float(np.mean([r["f32"] for r in sel])), 4), "mean_bf16": round(float(np.mean([r["bf16"] for r in sel])), 4)}), flush=True)


if __name__ == "__main__":
    main()
