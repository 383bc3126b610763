"""Head-to-head HSTU generative parity (BASELINE.json config: HSTU/Amazon-Books).

Identical Markov-structured sequences + identical hyperparameters in both
frameworks; evaluation = SeqTrainer's (loss, top-1 hit on held-out target).
Measured results recorded in BASELINE.md.

    PARITY_EPOCHS=15 python benchmarks/parity/run_parity_hstu.py
"""

import contextlib
import io
import os
import sys

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.makedirs("/tmp/fake_meta/torch_rechub-0.0.3.dist-info", exist_ok=True)
_meta = "/tmp/fake_meta/torch_rechub-0.0.3.dist-info/METADATA"
if not os.path.exists(_meta):
    with open(_meta, "w") as f:
        f.write("Metadata-Version: 2.1\nName: torch-rechub\nVersion: 0.0.3\n")
sys.path.insert(0, "/tmp/fake_meta")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

VOCAB, L, D_MODEL, HEADS, LAYERS = 150, 24, 32, 2, 2
BS, EPOCHS = 64, int(os.environ.get("PARITY_EPOCHS", 15))
LR = float(os.environ.get("PARITY_LR", 3e-3))
N_SEQ = 800

HP = dict(d_model=D_MODEL, n_heads=HEADS, n_layers=LAYERS, dqk=16, dv=16, max_seq_len=L, dropout=0.0, use_time_embedding=True, num_time_buckets=16)


def markov_sequences(seed):
    """First-order Markov chains (3 successors/item) -> next-item is learnable."""
    rng = np.random.default_rng(seed)
    trans = rng.integers(1, VOCAB, (VOCAB, 3))
    toks = np.zeros((N_SEQ, L), np.int32)
    tds = np.zeros((N_SEQ, L), np.int32)
    targets = np.zeros(N_SEQ, np.int32)
    for u in range(N_SEQ):
        length = rng.integers(L // 2, L + 1)
        cur = int(rng.integers(1, VOCAB))
        seq = []
        for _ in range(length):
            seq.append(cur)
            cur = int(trans[cur, rng.integers(0, 3)])
        toks[u, L - length:] = seq  # pre-padded: last position = last item
        tds[u, L - length:] = np.arange(length)[::-1] * 3600
        targets[u] = cur
    positions = np.tile(np.arange(L, dtype=np.int32), (N_SEQ, 1))
    split = int(N_SEQ * 0.85)
    return (toks[:split], positions[:split], targets[:split], tds[:split]), (toks[split:], positions[split:], targets[split:], tds[split:])


def reference_run(seed):
    import torch

    from torch_rechub.models.generative import HSTUModel as THSTU
    from torch_rechub.trainers import SeqTrainer as TSeq
    from torch_rechub.utils.data import SequenceDataGenerator as TGen

    torch.manual_seed(seed)
    (tr, te) = markov_sequences(seed)
    train_dl = TGen(tr[0], tr[1], tr[2], tr[3]).generate_dataloader(batch_size=BS, num_workers=0)[0]
    test_dl = TGen(te[0], te[1], te[2], te[3]).generate_dataloader(batch_size=BS, num_workers=0)[0]
    model = THSTU(vocab_size=VOCAB, **HP)
    os.makedirs(f"/tmp/ph_t{seed}", exist_ok=True)
    t = TSeq(model, optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, device="cpu", model_path=f"/tmp/ph_t{seed}")
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(train_dl, test_dl)
        loss, hit = t.evaluate(test_dl)
    return float(loss), float(hit)


def ours_run(seed):
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers import SeqTrainer
    from torch_rechub_tpu.utils.data import SequenceDataGenerator

    (tr, te) = markov_sequences(seed)
    train_dl = SequenceDataGenerator(tr[0], tr[1], tr[2], tr[3], seed=seed).generate_dataloader(batch_size=BS)[0]
    test_dl = SequenceDataGenerator(te[0], te[1], te[2], te[3], seed=seed).generate_dataloader(batch_size=BS, shuffle=False)[0]
    model = HSTUModel(vocab_size=VOCAB, **HP)
    t = SeqTrainer(model, optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, model_path=f"/tmp/ph_j{seed}", seed=seed)
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(train_dl, test_dl)
        loss, hit = t.evaluate(test_dl)
    return float(loss), float(hit)


def main():
    seeds = (0, 1, 2)
    ref = [reference_run(s) for s in seeds]
    ours = [ours_run(s) for s in seeds]
    ref_hit = np.mean([h for _, h in ref])
    ours_hit = np.mean([h for _, h in ours])
    print(f"reference HSTU: loss {[round(l, 3) for l, _ in ref]} hit@1 {[round(h, 3) for _, h in ref]} mean hit {ref_hit:.4f}")
    print(f"ours HSTU:      loss {[round(l, 3) for l, _ in ours]} hit@1 {[round(h, 3) for _, h in ours]} mean hit {ours_hit:.4f}")


if __name__ == "__main__":
    main()
