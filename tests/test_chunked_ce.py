"""Chunked large-vocab CE == dense next-token CE (values + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.models.generative.hstu import HSTUModel
from torch_rechub_tpu.ops.chunked_ce import chunked_last_logits, chunked_logsumexp, chunked_next_token_loss
from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer, next_token_loss
from torch_rechub_tpu.utils.data import SequenceDataGenerator

VOCAB, L, D = 97, 12, 16  # prime vocab → ragged final chunk


def seq_batch(n=6, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, L + 1, n)
    toks = np.zeros((n, L), dtype=np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, VOCAB, l)
    tds = rng.integers(0, 86400, (n, L)).astype(np.int32)
    targets = rng.integers(1, VOCAB, n).astype(np.int32)
    return toks, tds, targets


@pytest.mark.parametrize("chunk_size", [16, 97, 4096])
def test_chunked_logsumexp_matches_dense(chunk_size):
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(4, L, D)), jnp.float32)
    weight = jnp.asarray(rng.normal(size=(VOCAB, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(VOCAB,)), jnp.float32)
    logits = (jnp.einsum("bld,vd->blv", hidden, weight) + bias).at[..., 0].set(-1e9) / 0.7
    dense = jax.scipy.special.logsumexp(logits, axis=-1)
    ours = chunked_logsumexp(hidden, weight, bias, temperature=0.7, ignore_index=0, chunk_size=chunk_size)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(dense), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_bias,temperature", [(True, 1.0), (False, 0.5)])
def test_chunked_loss_and_grads_match_dense(use_bias, temperature):
    rng = np.random.default_rng(2)
    toks, _tds, targets = seq_batch()
    hidden = jnp.asarray(rng.normal(size=(toks.shape[0], L, D)), jnp.float32)
    weight = jnp.asarray(rng.normal(size=(VOCAB, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(VOCAB,)), jnp.float32) if use_bias else None

    def dense_loss(hidden, weight, bias):
        logits = jnp.einsum("bld,vd->blv", hidden, weight)
        if bias is not None:
            logits = logits + bias
        return next_token_loss(logits, jnp.asarray(toks), jnp.asarray(targets), temperature, 0)

    def chunked(hidden, weight, bias):
        return chunked_next_token_loss(hidden, weight, jnp.asarray(toks), jnp.asarray(targets), bias, temperature, 0, chunk_size=16)

    ld, gd = jax.value_and_grad(dense_loss, argnums=(0, 1))(hidden, weight, bias)
    lc, gc = jax.value_and_grad(chunked, argnums=(0, 1))(hidden, weight, bias)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5)
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_hstu_return_hidden_reconstructs_logits():
    model = HSTUModel(vocab_size=VOCAB, d_model=D, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8, score_norm="l2", temperature=0.3)
    toks, tds, _ = seq_batch()
    variables = model.init(jax.random.PRNGKey(0), toks, tds, training=False)
    dense = np.asarray(model.apply(variables, toks, tds, training=False))
    out = model.apply(variables, toks, tds, training=False, return_hidden=True)
    recon = np.asarray(chunked_last_logits(out["hidden"][:, -1, :], out["weight"], out["bias"], model.temperature))
    np.testing.assert_allclose(recon, dense[:, -1, :], rtol=2e-5, atol=2e-5)


def test_seq_trainer_chunked_path_trains_and_matches_dense_eval():
    toks, tds, targets = seq_batch(n=16, seed=3)
    positions = np.tile(np.arange(L, dtype=np.int32), (16, 1))
    dg = SequenceDataGenerator(toks, positions, targets, tds)
    train_dl, val_dl, _ = dg.generate_dataloader(batch_size=8, split_ratio=(0.5, 0.25, 0.25))
    model = HSTUModel(vocab_size=VOCAB, d_model=D, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8)

    t_dense = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_seq_dense", seed=0)
    t_chunk = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_seq_chunk", seed=0, vocab_chunk_size=16)
    t_dense.fit(train_dl, val_dl)
    t_chunk.fit(train_dl, val_dl)
    ld, hd = t_dense.evaluate(val_dl)
    lc, hc = t_chunk.evaluate(val_dl)
    # identical seeds → identical training trajectories regardless of CE path
    assert abs(ld - lc) < 1e-3
    assert hd == pytest.approx(hc, abs=1e-6)


def test_seq_trainer_steps_per_call_matches_single():
    """SeqTrainer device-side scan == per-step dispatch (dropout off)."""
    toks, tds, targets = seq_batch(n=24, seed=5)
    positions = np.tile(np.arange(L, dtype=np.int32), (24, 1))
    model = HSTUModel(vocab_size=VOCAB, d_model=D, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8)

    def run(steps_per_call):
        dg = SequenceDataGenerator(toks, positions, targets, tds)
        (dl,) = dg.generate_dataloader(batch_size=8, shuffle=False)
        t = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_seq_spc", seed=0, steps_per_call=steps_per_call)
        return [t.train_one_epoch(dl) for _ in range(2)]

    # not bit-equal: XLA fuses the scan body differently than the standalone
    # step and Adam amplifies the roundoff; trajectories must stay close
    np.testing.assert_allclose(run(1), run(2), rtol=1e-2)


# ---------------------------------------------------------------------------
# round 5: sampled softmax
# ---------------------------------------------------------------------------

def test_sampled_loss_pad_semantics_and_finiteness():
    from torch_rechub_tpu.ops.chunked_ce import sampled_next_token_loss

    rng = np.random.default_rng(0)
    b, l, d, v = 4, 8, 16, 50
    hidden = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
    toks = rng.integers(1, v, (b, l)).astype(np.int32)
    toks[0, :] = 0  # fully padded row
    toks[1, 4:] = 0  # padded suffix
    tgts = rng.integers(1, v, b).astype(np.int32)
    key = jax.random.PRNGKey(3)

    loss = sampled_next_token_loss(hidden, weight, jnp.asarray(toks), jnp.asarray(tgts), key, bias, num_negatives=32)
    assert np.isfinite(float(loss))

    # PAD-masked positions must not contribute: perturbing the fully-padded
    # row's hidden states leaves the loss unchanged
    hidden2 = hidden.at[0].add(100.0)
    loss2 = sampled_next_token_loss(hidden2, weight, jnp.asarray(toks), jnp.asarray(tgts), key, bias, num_negatives=32)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_sampled_loss_approximates_full_ce():
    """With many negatives + logq correction the sampled loss tracks the full
    CE closely (same hidden/weights, small vocab)."""
    from torch_rechub_tpu.ops.chunked_ce import sampled_next_token_loss
    from torch_rechub_tpu.trainers.seq_trainer import next_token_loss

    rng = np.random.default_rng(1)
    b, l, d, v = 8, 16, 16, 64
    hidden = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32)) * 0.3
    weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)) * 0.3
    toks = rng.integers(1, v, (b, l)).astype(np.int32)
    tgts = rng.integers(1, v, b).astype(np.int32)
    logits = jnp.einsum("bld,vd->blv", hidden, weight)
    full = float(next_token_loss(logits, jnp.asarray(toks), jnp.asarray(tgts), 1.0, 0))
    samples = [
        float(sampled_next_token_loss(hidden, weight, jnp.asarray(toks), jnp.asarray(tgts), jax.random.PRNGKey(s), None, num_negatives=2048))
        for s in range(4)
    ]
    assert abs(np.mean(samples) - full) / full < 0.15, (np.mean(samples), full)


def test_seq_trainer_sampled_softmax_learns():
    """SeqTrainer(loss_type='sampled_softmax') learns the successor task."""
    from torch_rechub_tpu.models.generative.hstu import HSTUModel
    from torch_rechub_tpu.trainers import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(0)
    vocab, L, n = 30, 16, 128
    starts = rng.integers(1, vocab, n)
    toks = np.zeros((n, L), np.int32)
    for i, s in enumerate(starts):
        toks[i] = 1 + (s - 1 + np.arange(L)) % (vocab - 1)
    tds = np.tile(np.arange(L) * 60, (n, 1)).astype(np.int32)
    targets = (1 + (toks[:, -1] - 1 + 1) % (vocab - 1)).astype(np.int32)
    pos = np.tile(np.arange(L), (n, 1))
    model = HSTUModel(vocab_size=vocab, d_model=32, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8, tie_embeddings=False)
    tr = SeqTrainer(model, n_epoch=1, model_path="/tmp/seq_sampled", loss_type="sampled_softmax", loss_params={"num_negatives": 16}, sparse_embedding="adagrad", optimizer_params={"lr": 5e-3}, steps_per_call=2)
    dl = SeqLoader(toks, pos, targets, tds, batch_size=32, shuffle=False)
    for _ in range(8):
        tr.train_one_epoch(dl, log_interval=0)
    vloss, acc = tr.evaluate(dl)
    assert np.isfinite(vloss)
    assert acc > 0.7, acc


def test_sampled_row_grads_match_dense_weight_grad():
    """scatter(candidate ids, d loss/d gathered rows) == dense d loss/d weight
    (the identity the sparse-output SeqTrainer path relies on)."""
    from torch_rechub_tpu.ops.chunked_ce import sampled_candidates, sampled_loss_from_rows, sampled_next_token_loss

    rng = np.random.default_rng(2)
    b, l, d, v, s = 4, 8, 16, 40, 24
    hidden = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32)) * 0.3
    weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)) * 0.3
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32)) * 0.1
    toks = rng.integers(1, v, (b, l)).astype(np.int32)
    toks[1, 5:] = 0
    tgts = rng.integers(1, v, b).astype(np.int32)
    key = jax.random.PRNGKey(9)

    dense_grad = jax.grad(lambda w: sampled_next_token_loss(hidden, w, jnp.asarray(toks), jnp.asarray(tgts), key, bias, num_negatives=s))(weight)

    next_tokens, negs = sampled_candidates(jnp.asarray(toks), jnp.asarray(tgts), key, v, s)
    w_pos = jnp.take(weight, next_tokens, axis=0)
    w_neg = jnp.take(weight, negs, axis=0)

    def rows_loss(w_pos, w_neg):
        return sampled_loss_from_rows(hidden, w_pos, w_neg, bias[next_tokens], bias[negs], next_tokens, negs, v)

    g_pos, g_neg = jax.grad(rows_loss, argnums=(0, 1))(w_pos, w_neg)
    scattered = jnp.zeros_like(weight).at[next_tokens.reshape(-1)].add(g_pos.reshape(-1, d)).at[negs].add(g_neg)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(dense_grad), rtol=1e-5, atol=1e-6)


def test_sampled_ignore_index_nonzero():
    """ignore_index != 0: ignored positions masked, negatives never sample it."""
    from torch_rechub_tpu.ops.chunked_ce import sampled_candidates, sampled_next_token_loss

    rng = np.random.default_rng(4)
    b, l, d, v, ii = 4, 8, 8, 30, 5
    hidden = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    toks = rng.integers(1, v, (b, l)).astype(np.int32)
    toks[toks == ii] = ii + 1
    toks[0, :] = ii  # fully ignored row
    tgts = rng.integers(1, v, b).astype(np.int32)
    key = jax.random.PRNGKey(0)

    _, negs = sampled_candidates(jnp.asarray(toks), jnp.asarray(tgts), key, v, 512, ignore_index=ii)
    assert not np.any(np.asarray(negs) == ii)

    loss = sampled_next_token_loss(hidden, weight, jnp.asarray(toks), jnp.asarray(tgts), key, None, ignore_index=ii, num_negatives=64)
    hidden2 = hidden.at[0].add(50.0)  # ignored row must not contribute
    loss2 = sampled_next_token_loss(hidden2, weight, jnp.asarray(toks), jnp.asarray(tgts), key, None, ignore_index=ii, num_negatives=64)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_sampled_logq_correction_outside_temperature():
    """With T != 1 the estimator still tracks the full CE (the round-5 review
    found the correction was scaled by 1/T; this pins the fixed order)."""
    from torch_rechub_tpu.ops.chunked_ce import sampled_next_token_loss
    from torch_rechub_tpu.trainers.seq_trainer import next_token_loss

    rng = np.random.default_rng(6)
    b, l, d, v, T = 8, 16, 16, 64, 0.25
    hidden = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32)) * 0.3
    weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)) * 0.3
    toks = rng.integers(1, v, (b, l)).astype(np.int32)
    tgts = rng.integers(1, v, b).astype(np.int32)
    logits = jnp.einsum("bld,vd->blv", hidden, weight)
    full = float(next_token_loss(logits, jnp.asarray(toks), jnp.asarray(tgts), T, 0))
    samples = [
        float(sampled_next_token_loss(hidden, weight, jnp.asarray(toks), jnp.asarray(tgts), jax.random.PRNGKey(s), None, temperature=T, num_negatives=2048))
        for s in range(4)
    ]
    assert abs(np.mean(samples) - full) / full < 0.15, (np.mean(samples), full)


def test_seq_sparse_sampled_l2_exact_vs_dense_grad():
    """score_norm='l2' + sampled softmax + sparse in/out tables: one SGD step
    equals the dense gradients of the SAME sampled loss (normalization
    Jacobian included — the round-5 review found raw rows bypassed it)."""
    from torch_rechub_tpu.models.generative.hstu import HSTUModel
    from torch_rechub_tpu.trainers import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader
    from torch_rechub_tpu.ops.chunked_ce import sampled_next_token_loss

    rng = np.random.default_rng(3)
    n, L, vocab, S = 16, 16, 50, 32
    lengths = rng.integers(2, L + 1, n)
    toks = np.zeros((n, L), dtype=np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, vocab, l)
    tds = rng.integers(0, 86400, (n, L)).astype(np.int32)
    targets = rng.integers(1, vocab, n).astype(np.int32)
    pos = np.tile(np.arange(L), (n, 1))
    model = HSTUModel(vocab_size=vocab, d_model=32, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8, tie_embeddings=False, score_norm="l2", temperature=0.5, use_output_bias=False)
    lr = 0.05
    tr = SeqTrainer(model, n_epoch=1, model_path="/tmp/seq_sparse_l2", loss_type="sampled_softmax", loss_params={"num_negatives": S}, sparse_embedding="sgd", optimizer_params={"lr": lr})
    dl = SeqLoader(toks, pos, targets, tds, batch_size=n, shuffle=False)
    tr._ensure_ready(dl)
    params0 = jax.device_get(tr.state.params)
    bs0 = jax.device_get(tr.state.batch_stats)

    # replicate the step's sampling key: with steps_per_call=1 and one plain
    # batch the trainer calls _train_step with next_dropout_rng() directly
    step_rng = jax.random.split(tr._rng)[0]
    samp_key = jax.random.fold_in(step_rng, 0x5A)

    def dense_loss(params):
        out = model.apply({"params": params, "batch_stats": bs0, **tr.const_vars}, jnp.asarray(toks), jnp.asarray(tds), training=True, return_hidden=True, rngs={"dropout": step_rng})
        # out["weight"] is the l2-normalized full table -> dense grads include
        # the normalization Jacobian
        return sampled_next_token_loss(out["hidden"], out["weight"], jnp.asarray(toks), jnp.asarray(targets), samp_key, out["bias"], 0.5, 0, S)

    dense_grads = jax.grad(dense_loss)(params0)

    tr.train_one_epoch(dl)
    new = jax.device_get(tr.state.params)
    for name in ("token_embedding", "output_projection"):
        expected = params0[name] - lr * np.asarray(dense_grads[name])
        np.testing.assert_allclose(np.asarray(new[name]), expected, rtol=1e-4, atol=1e-6, err_msg=name)
