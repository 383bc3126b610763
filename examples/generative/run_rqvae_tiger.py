"""RQ-VAE -> semantic IDs -> TIGER generative retrieval, end-to-end.

Usage (parity with reference ``run_rqvae_amazon_books.py`` + ``run_tiger_*``):
    python examples/generative/run_rqvae_tiger.py --rqvae_epochs 10 --tiger_steps 200
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import optax

from torch_rechub_tpu.models.generative.rqvae import RQVAEModel
from torch_rechub_tpu.models.generative.tiger import TIGERModel, generate
from torch_rechub_tpu.trainers import RQVAETrainer
from torch_rechub_tpu.utils.data import pad_sequences
from torch_rechub_tpu.utils.tiger import Trie, build_tiger_samples, semantic_id_vocab


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_items", type=int, default=200)
    parser.add_argument("--emb_dim", type=int, default=32)
    parser.add_argument("--rqvae_epochs", type=int, default=10)
    parser.add_argument("--tiger_steps", type=int, default=200)
    parser.add_argument("--save_dir", default="./saved")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    # stage 1: item embeddings -> semantic ids
    centers = rng.normal(size=(10, args.emb_dim)) * 3
    item_emb = (centers[rng.integers(0, 10, args.n_items)] + rng.normal(size=(args.n_items, args.emb_dim)) * 0.1).astype(np.float32)
    rqvae = RQVAEModel(in_dim=args.emb_dim, num_emb_list=(32, 32), e_dim=16, layers=(32,), sk_epsilons=(0.0, 0.003), kmeans_init=True, kmeans_iters=5)
    rq_trainer = RQVAETrainer(rqvae, n_epoch=args.rqvae_epochs, eval_step=5, model_path=args.save_dir, use_sk=False)
    rq_trainer.fit(item_emb, batch_size=64)
    sids = rq_trainer.generate_semantic_ids(item_emb, batch_size=64)

    vocab, item_tokens = semantic_id_vocab(sids)
    print(f"semantic-id vocab: {len(vocab)} tokens over {len(item_tokens)} items")

    # stage 2: user histories -> TIGER seq2seq over semantic ids
    histories = {u: rng.integers(0, args.n_items, rng.integers(4, 12)).tolist() for u in range(300)}
    tx_in, tx_lab, te_in, te_lab = build_tiger_samples(histories, item_tokens, eos_token_id=1)
    vocab_size = len(vocab) + 2
    max_in = max(len(s) for s in tx_in + te_in)
    X = pad_sequences(tx_in, maxlen=max_in, padding="post")
    Y = pad_sequences(tx_lab, maxlen=3, padding="post", value=-100)
    model = TIGERModel(vocab_size=vocab_size, d_model=64, n_heads=4, n_enc_layers=2, n_dec_layers=2, d_ff=128, dropout=0.1, max_len=max(max_in, 8))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.asarray(X[:2]), labels=jnp.asarray(Y[:2]), training=False)
    params = variables["params"]
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, rng):
        def lf(p):
            return model.apply({"params": p}, xb, labels=yb, training=True, rngs={"dropout": rng})[0]

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = 64
    for it in range(args.tiger_steps):
        idx = rng.integers(0, len(X), bs)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(X[idx]), jnp.asarray(Y[idx]), jax.random.PRNGKey(it))
        if (it + 1) % 50 == 0:
            print(f"step {it+1} loss {float(loss):.4f}")

    # stage 3: trie-constrained generation + recall (skipped for the
    # RQ-VAE-only preset, tiger_steps=0)
    if args.tiger_steps == 0:
        return
    trie = Trie([toks + [1] for toks in item_tokens.values()])
    Xt = pad_sequences(te_in, maxlen=max_in, padding="post")[:50]
    out = generate(model, {"params": params}, Xt, max_new_tokens=3, num_beams=5, trie=trie, eos_token_id=1)
    code_to_item = {tuple(toks): it for it, toks in item_tokens.items()}
    hits = 0
    for beams, lab in zip(out, te_lab[:50]):
        target = tuple(lab[:-1])
        predicted = [tuple(b[:-1] if b and b[-1] == 1 else b) for b in beams]
        hits += int(target in predicted)
    print(f"recall@5 over semantic ids: {hits/50:.3f}")


if __name__ == "__main__":
    main()
