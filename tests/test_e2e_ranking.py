"""End-to-end ranking tests: synthetic data -> fit -> evaluate, per model.

Mirrors the reference test strategy (``/root/reference/tests/test_e2e_ranking.py``):
small random data, one epoch, assert a sane AUC — catches shape/wiring bugs
in every load-bearing layer.
"""

import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models import ranking
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import DataGenerator

from conftest import synthetic_ctr_frame


def make_features(n_sparse=5, n_dense=5, vocab=64, embed_dim=8):
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=vocab, embed_dim=embed_dim) for i in range(n_sparse))
    dense = tuple(DenseFeature(f"I{i}") for i in range(n_dense))
    return sparse, dense


def build_model(name):
    sparse, dense = make_features()
    mlp_params = {"dims": (16, 8), "dropout": 0.2, "activation": "relu"}
    if name == "WideDeep":
        return ranking.WideDeep(wide_features=dense, deep_features=sparse, mlp_params=mlp_params)
    if name == "DeepFM":
        return ranking.DeepFM(deep_features=dense, fm_features=sparse, mlp_params=mlp_params)
    if name == "DCN":
        return ranking.DCN(features=sparse + dense, n_cross_layers=2, mlp_params=mlp_params)
    if name == "DCNv2":
        return ranking.DCNv2(features=sparse + dense, n_cross_layers=2, mlp_params=mlp_params, low_rank=4, num_experts=2)
    if name == "DCNv2_stacked":
        return ranking.DCNv2(features=sparse + dense, n_cross_layers=2, mlp_params=mlp_params, model_structure="stacked", use_low_rank_mixture=False)
    if name == "EDCN":
        return ranking.EDCN(features=sparse, n_cross_layers=2, mlp_params=dict(mlp_params))
    if name == "AFM":
        return ranking.AFM(fm_features=sparse, embed_dim=8, t=16)
    if name == "AutoInt":
        return ranking.AutoInt(sparse_features=sparse, dense_features=dense, num_layers=2, mlp_params=mlp_params)
    if name == "FiBiNet":
        return ranking.FiBiNet(features=sparse, mlp_params=mlp_params)
    if name == "DeepFFM":
        from torch_rechub_tpu.basic.features import SparseFeature as SF

        cross = tuple(SF(f"C{i}", vocab_size=64 * 5, embed_dim=8) for i in range(5))
        linear = tuple(SF(f"C{i}", vocab_size=64, embed_dim=1) for i in range(5))
        return ranking.DeepFFM(linear_features=linear, cross_features=cross, embed_dim=8, mlp_params=mlp_params)
    if name == "FatDeepFFM":
        from torch_rechub_tpu.basic.features import SparseFeature as SF

        cross = tuple(SF(f"C{i}", vocab_size=64 * 5, embed_dim=8) for i in range(5))
        linear = tuple(SF(f"C{i}", vocab_size=64, embed_dim=1) for i in range(5))
        return ranking.FatDeepFFM(linear_features=linear, cross_features=cross, embed_dim=8, reduction_ratio=2, mlp_params=mlp_params)
    raise KeyError(name)


@pytest.mark.parametrize("model_name", ["WideDeep", "DeepFM", "DCN", "DCNv2", "DCNv2_stacked", "EDCN", "AFM", "AutoInt", "FiBiNet", "DeepFFM", "FatDeepFFM"])
def test_ranking_fit_evaluate(model_name):
    x, y = synthetic_ctr_frame(n=300)
    dg = DataGenerator(x, y)
    train_dl, val_dl, test_dl = dg.generate_dataloader(split_ratio=[0.7, 0.15], batch_size=64)
    model = build_model(model_name)
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_test_models")
    trainer.fit(train_dl, val_dl)
    auc = trainer.evaluate(model, test_dl)
    assert 0.0 <= auc <= 1.0
    preds = trainer.predict(model, test_dl)
    assert preds.shape == (test_dl.dataset_size,)
    assert np.all((preds >= 0) & (preds <= 1))


def test_partial_batch_padding_consistency():
    """Predictions must be identical whether or not the batch divides evenly."""
    x, y = synthetic_ctr_frame(n=100)
    sparse, dense = make_features()
    model = build_model("DeepFM")
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_test_models")
    from torch_rechub_tpu.utils.data import ArrayLoader

    dl_64 = ArrayLoader(x, y, batch_size=64)
    dl_50 = ArrayLoader(x, y, batch_size=50)
    trainer._ensure_ready(dl_64)
    p1 = trainer.predict(model, dl_64)
    p2 = trainer.predict(model, dl_50)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)


def test_regularization_and_scheduler_run():
    x, y = synthetic_ctr_frame(n=128)
    model = build_model("DCN")
    trainer = CTRTrainer(
        model,
        n_epoch=2,
        model_path="/tmp/rechub_test_models",
        regularization_params={"embedding_l2": 1e-4, "dense_l2": 1e-4},
        scheduler_params={"step_size": 1, "gamma": 0.5},
    )
    dg = DataGenerator(x, y)
    train_dl, val_dl, _ = dg.generate_dataloader(split_ratio=[0.8, 0.1], batch_size=32)
    trainer.fit(train_dl, val_dl)
    assert trainer.epoch_lr(1) == pytest.approx(trainer.lr0 * 0.5)
