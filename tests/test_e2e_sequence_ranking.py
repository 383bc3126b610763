"""End-to-end tests for sequence ranking models (DIN / BST / DIEN)."""

import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SequenceFeature, SparseFeature
from torch_rechub_tpu.models.ranking import BST, DIEN, DIN
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

N_ITEMS, SEQ_LEN, EMBED = 50, 10, 8


def seq_data(n=200, seed=0, with_neg=False):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, SEQ_LEN + 1, n)
    hist = np.zeros((n, SEQ_LEN), dtype=np.int32)
    for i, l in enumerate(lengths):
        hist[i, :l] = rng.integers(1, N_ITEMS, l)
    x = {
        "hist_item": hist,
        "target_item": rng.integers(1, N_ITEMS, n).astype(np.int32),
        "user_cat": rng.integers(0, 10, n).astype(np.int32),
        "price": rng.normal(size=n).astype(np.float32),
    }
    if with_neg:
        neg = np.where(hist > 0, (hist + rng.integers(1, N_ITEMS - 1, hist.shape)) % N_ITEMS, 0)
        neg = np.where((neg == 0) & (hist > 0), 1, neg)
        x["neg_hist_item"] = neg.astype(np.int32)
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


def common_features():
    target = (SparseFeature("target_item", vocab_size=N_ITEMS, embed_dim=EMBED, padding_idx=0),)
    history = (SequenceFeature("hist_item", vocab_size=N_ITEMS, embed_dim=EMBED, pooling="concat", shared_with="target_item", padding_idx=0),)
    profile = (SparseFeature("user_cat", vocab_size=10, embed_dim=4), DenseFeature("price"))
    return profile, history, target


def run_trainer(model, x, y, loss_mode=True):
    dl = ArrayLoader(x, y, batch_size=64, shuffle=True)
    val = ArrayLoader(x, y, batch_size=64)
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_test_models", loss_mode=loss_mode)
    trainer.fit(dl, val)
    auc = trainer.evaluate(model, val)
    assert 0.0 <= auc <= 1.0
    return trainer


def test_din_e2e():
    x, y = seq_data()
    profile, history, target = common_features()
    model = DIN(features=profile, history_features=history, target_features=target, mlp_params={"dims": (16, 8)}, attention_mlp_params={"dims": (8,)})
    run_trainer(model, x, y)


def test_bst_e2e():
    x, y = seq_data()
    profile, history, target = common_features()
    model = BST(features=profile, history_features=history, target_features=target, mlp_params={"dims": (16,)}, nhead=2, num_layers=1, max_seq_len=SEQ_LEN + 1, dim_feedforward=32)
    run_trainer(model, x, y)


def test_dien_e2e():
    x, y = seq_data(with_neg=True)
    profile, history, target = common_features()
    neg_history = (SequenceFeature("neg_hist_item", vocab_size=N_ITEMS, embed_dim=EMBED, pooling="concat", shared_with="target_item", padding_idx=0),)
    model = DIEN(features=profile, history_features=history, neg_history_features=neg_history, target_features=target, mlp_params={"dims": (16,)}, alpha=0.2)
    run_trainer(model, x, y, loss_mode=False)


def test_dien_all_padding_row_finite():
    """All-padding history must not produce NaNs (uniform attention + zero state)."""
    import jax

    x, y = seq_data(n=8, with_neg=True)
    x["hist_item"][0] = 0
    x["neg_hist_item"][0] = 0
    profile, history, target = common_features()
    neg_history = (SequenceFeature("neg_hist_item", vocab_size=N_ITEMS, embed_dim=EMBED, pooling="concat", shared_with="target_item", padding_idx=0),)
    model = DIEN(features=profile, history_features=history, neg_history_features=neg_history, target_features=target, mlp_params={"dims": (8,)})
    variables = model.init(jax.random.PRNGKey(0), {k: v for k, v in x.items()}, training=False)
    (logits, aux), _ = model.apply(variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(float(aux))
