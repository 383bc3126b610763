"""Sampled-softmax vs full-CE quality parity, seed-level.

Trains the SAME untied HSTU on the same first-order-Markov sequences (the
``run_parity_hstu.py`` generator) under three output losses and prints the
held-out top-1 hit side by side:

- full cross-entropy (dense reference semantics);
- sampled softmax (S=256 shared uniform negatives, logQ correction);
- sampled softmax + sparse row-wise Adagrad on BOTH vocab tables
  (the production recipe, ``examples/generative/run_hstu_production_vocab.py``).

Evaluation is the full-vocab exact CE/top-1 in every arm, so the comparison
isolates the TRAINING estimator.  Quality claim: per-seed hit deltas within
the seed spread of full CE.

Usage: ``python benchmarks/parity/run_parity_sampled.py`` (TPU or CPU).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from run_parity_hstu import BS, EPOCHS, HP, LR, VOCAB, markov_sequences

SEEDS = (0, 1, 2)
NUM_NEGATIVES = 256


def run(seed, arm):
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers import SeqTrainer
    from torch_rechub_tpu.utils.data import SequenceDataGenerator

    (tr, te) = markov_sequences(seed)
    train_dl = SequenceDataGenerator(tr[0], tr[1], tr[2], tr[3], seed=seed).generate_dataloader(batch_size=BS)[0]
    test_dl = SequenceDataGenerator(te[0], te[1], te[2], te[3], seed=seed).generate_dataloader(batch_size=BS, shuffle=False)[0]
    hp = dict(HP, tie_embeddings=False)
    model = HSTUModel(vocab_size=VOCAB, **hp)
    kw = dict(optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, model_path=f"/tmp/ps_{arm}_{seed}", seed=seed)
    if arm == "full_ce":
        t = SeqTrainer(model, **kw)
    elif arm == "sampled":
        t = SeqTrainer(model, loss_type="sampled_softmax", loss_params={"num_negatives": NUM_NEGATIVES}, **kw)
    else:  # sampled_sparse
        # the sparse path swaps the TABLE optimizer (row-wise Adagrad vs the
        # dense arms' Adam); Adagrad's accumulator normalization wants a ~3x
        # larger lr — with the dense arms' lr it lands ~0.06 hit lower, with
        # this one it matches (measured three-seed sweep)
        kw = dict(kw, optimizer_params={"lr": 1e-2, "weight_decay": 1e-5})
        t = SeqTrainer(model, loss_type="sampled_softmax", loss_params={"num_negatives": NUM_NEGATIVES}, sparse_embedding="adagrad", **kw)
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(train_dl, test_dl)
        loss, hit = t.evaluate(test_dl)
    return float(loss), float(hit)


def main():
    rows = {}
    for arm in ("full_ce", "sampled", "sampled_sparse"):
        rows[arm] = [run(s, arm) for s in SEEDS]
        print(f"# {arm}: " + " ".join(f"seed{s}: loss={l:.4f} hit@1={h:.3f}" for s, (l, h) in zip(SEEDS, rows[arm])), flush=True)
    summary = {arm: {"hit_mean": round(float(np.mean([h for _, h in r])), 4), "hit_per_seed": [round(h, 4) for _, h in r]} for arm, r in rows.items()}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
