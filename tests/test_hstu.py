"""HSTU model invariants + SeqTrainer end-to-end (mirrors reference test_hstu_model.py)."""

import jax
import numpy as np
import pytest

from torch_rechub_tpu.models.generative.hstu import HSTUModel
from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer, next_token_loss
from torch_rechub_tpu.utils.data import SequenceDataGenerator
from torch_rechub_tpu.utils.hstu_utils import apply_vocab_mask

VOCAB, L, D = 50, 16, 32


def tiny_model(**kw):
    defaults = dict(vocab_size=VOCAB, d_model=D, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8)
    defaults.update(kw)
    return HSTUModel(**defaults)


def seq_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, L + 1, n)
    toks = np.zeros((n, L), dtype=np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, VOCAB, l)
    tds = rng.integers(0, 86400, (n, L)).astype(np.int32)
    targets = rng.integers(1, VOCAB, n).astype(np.int32)
    return toks, tds, targets


def test_hstu_shapes_and_pad_invariants():
    model = tiny_model()
    toks, tds, _ = seq_batch()
    variables = model.init(jax.random.PRNGKey(0), toks, tds, training=False)
    # PAD embedding row zero after init
    np.testing.assert_allclose(np.asarray(variables["params"]["token_embedding"][0]), 0.0)
    logits = model.apply(variables, toks, tds, training=False)
    assert logits.shape == (toks.shape[0], L, VOCAB)
    assert np.isfinite(np.asarray(logits)).all()


def test_hstu_padded_positions_nearly_inert():
    """Fully-padded suffix rows should produce output-bias-only logits."""
    model = tiny_model(use_output_bias=False)
    toks, tds, _ = seq_batch()
    toks[0, :] = 0  # entire row PAD
    variables = model.init(jax.random.PRNGKey(0), toks, tds, training=False)
    logits = np.asarray(model.apply(variables, toks, tds, training=False))
    np.testing.assert_allclose(logits[0], 0.0, atol=1e-5)


def test_hstu_seq_len_guard():
    model = tiny_model()
    toks = np.zeros((2, L + 4), dtype=np.int32)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), toks, None, training=False)


def test_hstu_score_norm_l2_temperature():
    model = tiny_model(score_norm="l2", temperature=0.5, use_output_bias=False)
    toks, tds, _ = seq_batch()
    variables = model.init(jax.random.PRNGKey(0), toks, tds, training=False)
    logits = np.asarray(model.apply(variables, toks, tds, training=False))
    # cosine scores / 0.5 are bounded by 2
    assert np.abs(logits).max() <= 2.0 + 1e-4


def test_next_token_loss_masks_pad():
    logits = np.zeros((1, 3, 5), dtype=np.float32)
    seq = np.array([[2, 3, 0]], dtype=np.int32)
    tgt = np.array([4], dtype=np.int32)
    loss = float(next_token_loss(jax.numpy.asarray(logits), jax.numpy.asarray(seq), jax.numpy.asarray(tgt)))
    # position 0 label=3, position 1 label=0(pad->from seq_tokens==0? no: seq[:,1]=3 valid label from seq[2]=0 masked) ...
    assert np.isfinite(loss) and loss > 0


def test_seq_trainer_fit_and_eval():
    toks, tds, targets = seq_batch(n=64)
    positions = np.tile(np.arange(L), (64, 1))
    gen = SequenceDataGenerator(toks, positions, targets, tds)
    train_dl, val_dl, test_dl = gen.generate_dataloader(batch_size=16, split_ratio=(0.7, 0.15, 0.15))
    trainer = SeqTrainer(tiny_model(), n_epoch=1, model_path="/tmp/rechub_seq")
    trainer.fit(train_dl, val_dl)
    loss, acc = trainer.evaluate(test_dl)
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 1.0


def test_seq_trainer_nce_loss():
    toks, tds, targets = seq_batch(n=32)
    positions = np.tile(np.arange(L), (32, 1))
    gen = SequenceDataGenerator(toks, positions, targets, tds)
    (train_dl,) = gen.generate_dataloader(batch_size=16)
    trainer = SeqTrainer(tiny_model(), n_epoch=1, loss_type="nce", model_path="/tmp/rechub_seq")
    trainer.fit(train_dl)


def test_apply_vocab_mask():
    logits = np.ones((2, 6), dtype=np.float32)
    out = np.asarray(apply_vocab_mask(jax.numpy.asarray(logits), static_invalid=[0], invalid_ids=np.array([[1, 2], [3, 9]])))
    assert (out[:, 0] <= -1e8).all()
    assert out[0, 1] <= -1e8 and out[0, 2] <= -1e8
    assert out[1, 3] <= -1e8
    assert out[1, 1] == 1.0  # untouched
