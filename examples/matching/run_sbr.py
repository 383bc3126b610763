"""Session-based recommendation example: SASRec / NARM / STAMP.

Usage (parity with reference ``examples/matching/run_sbr.py``):
    python examples/matching/run_sbr.py --model_name sasrec --epoch 2
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from torch_rechub_tpu.basic.features import SequenceFeature, SparseFeature
from torch_rechub_tpu.models import matching
from torch_rechub_tpu.trainers import MatchTrainer
from torch_rechub_tpu.utils.data import ArrayLoader


def sessions(n=600, n_items=100, seq_len=16, seed=0):
    rng = np.random.default_rng(seed)
    trans = rng.integers(1, n_items, (n_items, 3))
    seqs = np.zeros((n, seq_len), dtype=np.int32)
    targets = np.zeros(n, dtype=np.int32)
    for i in range(n):
        length = rng.integers(3, seq_len + 1)
        cur = rng.integers(1, n_items)
        for t in range(length):
            seqs[i, t] = cur
            cur = trans[cur, rng.integers(0, 3)]
        targets[i] = cur
    return seqs, targets


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="sasrec", choices=["sasrec", "narm", "stamp"])
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--embed_dim", type=int, default=32)
    parser.add_argument("--n_items", type=int, default=100)
    parser.add_argument("--seq_len", type=int, default=16)
    parser.add_argument("--save_dir", default="./saved")
    args = parser.parse_args()

    seqs, targets = sessions(n_items=args.n_items, seq_len=args.seq_len)
    if args.model_name == "sasrec":
        feats = (SequenceFeature("seq", vocab_size=args.n_items, embed_dim=args.embed_dim, pooling="concat"),)
        item_fea = SparseFeature("target_item", vocab_size=args.n_items, embed_dim=args.embed_dim, shared_with="seq")
        model = matching.SASRec(features=feats, max_len=args.seq_len, num_blocks=2, item_feature=item_fea)
        x = {"seq": seqs, "target_item": targets}
        trainer = MatchTrainer(model, mode=0, in_batch_neg=True, in_batch_neg_ratio=16, n_epoch=args.epoch, model_path=args.save_dir)
        trainer.fit(ArrayLoader(x, np.ones(len(seqs), np.float32), batch_size=args.batch_size, shuffle=True))
    else:
        fea = SequenceFeature("hist_item", vocab_size=args.n_items, embed_dim=args.embed_dim, pooling="concat", padding_idx=0)
        if args.model_name == "narm":
            model = matching.NARM(item_history_feature=fea, hidden_dim=args.embed_dim, emb_dropout_p=0.2, session_rep_dropout_p=0.2)
        else:
            model = matching.STAMP(item_history_feature=fea, weight_std=0.05, emb_std=0.002)
        x = {"hist_item": seqs}
        trainer = MatchTrainer(model, mode=2, n_epoch=args.epoch, model_path=args.save_dir)
        trainer.fit(ArrayLoader(x, targets.astype(np.int64), batch_size=args.batch_size, shuffle=True))

    # hit@10 over full softmax / dot scores
    import jax
    import jax.numpy as jnp

    if args.model_name == "sasrec":
        user = trainer.inference_embedding(model, "user", ArrayLoader({"seq": seqs}, batch_size=args.batch_size), args.save_dir)
        table = trainer.state.params["item_emb"]["seq_table"]
        scores = np.array(jnp.asarray(user) @ jnp.asarray(table).T)
    else:
        scores = np.array(trainer.predict(model, ArrayLoader(x, batch_size=args.batch_size)))
    scores[:, 0] = -1e9
    top10 = np.argsort(-scores, axis=1)[:, :10]
    hit = np.mean([t in row for t, row in zip(targets, top10)])
    print(f"{args.model_name} hit@10: {hit:.4f} (random ~{10/args.n_items:.3f})")


if __name__ == "__main__":
    main()
