"""TIGER tests: seq2seq training step, trie-constrained generation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_rechub_tpu.models.generative.tiger import TIGERModel, generate
from torch_rechub_tpu.utils.tiger import Trie, build_tiger_samples, semantic_id_vocab

VOCAB = 30


def test_trie():
    t = Trie([[2, 3, 4], [2, 3, 5], [6, 7, 8]])
    assert sorted(t.allowed_next(())) == [2, 6]
    assert sorted(t.allowed_next((2, 3))) == [4, 5]
    assert t.allowed_next((9,)) == []
    assert [2, 3, 4] in t and [2, 9] not in t


def test_semantic_id_vocab_and_samples():
    indices = {0: ["<a_1>", "<b_2>"], 1: ["<a_1>", "<b_3>"], 2: ["<a_4>", "<b_2>"]}
    vocab, item_tokens = semantic_id_vocab(indices)
    assert len(vocab) == 4  # a_1, b_2, b_3, a_4
    assert item_tokens[0][0] == item_tokens[1][0]  # shared first code
    histories = {0: [0, 1, 2, 0], 1: [1, 2, 0, 1]}
    tx, ty, vx, vy = build_tiger_samples(histories, item_tokens, eos_token_id=1)
    assert len(vx) == 2  # one test sample per user
    assert all(y[-1] == 1 for y in ty + vy)


def test_tiger_train_and_constrained_generate():
    rng = np.random.default_rng(0)
    model = TIGERModel(vocab_size=VOCAB, d_model=32, n_heads=2, n_enc_layers=1, n_dec_layers=1, d_ff=64, dropout=0.0, max_len=16)
    x = rng.integers(2, VOCAB, (8, 6)).astype(np.int32)
    labels = rng.integers(2, VOCAB, (8, 3)).astype(np.int32)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x), labels=jnp.asarray(labels), training=False)
    loss, logits = model.apply(variables, jnp.asarray(x), labels=jnp.asarray(labels), training=False)
    assert np.isfinite(float(loss))
    assert logits.shape == (8, 3, VOCAB)

    # one jitted training step reduces loss on a fixed batch
    tx = optax.adam(1e-2)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            return model.apply({"params": p}, jnp.asarray(x), labels=jnp.asarray(labels), training=False)[0]

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        first = float(loss) if first is None else first
    assert float(loss) < first

    # constrained generation only emits valid codes
    valid = [[5, 6, 7], [5, 6, 8], [9, 10, 11]]
    trie = Trie(valid)
    out = generate(model, {"params": params}, x[:2], max_new_tokens=3, num_beams=2, trie=trie)
    for beams in out:
        for seq in beams:
            assert seq in trie, f"generated {seq} not in trie"
