"""Bucketed/device AUC: matches exact AUC, shards correctly, trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_rechub_tpu.basic.metric import auc_from_histogram, auc_histogram, auc_score, auc_score_bucketed


def test_bucketed_matches_exact():
    rng = np.random.default_rng(0)
    n = 20000
    y = rng.integers(0, 2, n).astype(np.float32)
    s = np.clip(rng.normal(0.5 + 0.2 * y, 0.2), 0, 1).astype(np.float32)
    exact = auc_score(y, s)
    bucketed = auc_score_bucketed(y, s)
    assert abs(exact - bucketed) < 1e-4, (exact, bucketed)


def test_histograms_add_across_shards():
    """Histogram of the union == sum of per-shard histograms (psum semantics)."""
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 4096).astype(np.float32)
    s = rng.random(4096).astype(np.float32)
    p_all, n_all = auc_histogram(y, s)
    parts = [auc_histogram(y[i::4], s[i::4]) for i in range(4)]
    p_sum = sum(p[0] for p in parts)
    n_sum = sum(p[1] for p in parts)
    np.testing.assert_allclose(np.asarray(p_all), np.asarray(p_sum))
    np.testing.assert_allclose(np.asarray(n_all), np.asarray(n_sum))
    np.testing.assert_allclose(float(auc_from_histogram(p_all, n_all)), float(auc_from_histogram(p_sum, n_sum)))


def test_weighted_histogram_ignores_padding():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 512).astype(np.float32)
    s = rng.random(512).astype(np.float32)
    w = np.ones(512, np.float32)
    w[400:] = 0.0
    p1, n1 = auc_histogram(y[:400], s[:400])
    p2, n2 = auc_histogram(y, s, weight=w)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2))


def test_trainer_bucketed_evaluate_matches_exact():
    from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DeepFM
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(3)
    n = 512
    x = {f"C{i}": rng.integers(0, 32, n).astype(np.int32) for i in range(3)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=32, embed_dim=8) for i in range(3))
    model = DeepFM(deep_features=(DenseFeature("I0"),), fm_features=sparse, mlp_params={"dims": (16,), "dropout": 0.0})
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_bauc")
    dl = ArrayLoader(x, y, batch_size=100, shuffle=False)  # partial last batch
    trainer.train_one_epoch(dl)
    exact = trainer.evaluate(model, dl)
    bucketed = trainer.evaluate(model, dl, bucketed=True)
    assert abs(exact - bucketed) < 5e-4, (exact, bucketed)
