"""Export tests: StableHLO round-trip (full + tower modes) and quantization."""

import jax
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models.matching import DSSM
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.utils.export import StableHLOExporter, dequantize_params, load_exported, quantization_error, quantize_params

SPARSE = tuple(SparseFeature(f"C{i}", vocab_size=40, embed_dim=8) for i in range(3))
DENSE = (DenseFeature("I0"),)


def ctr_model_and_input():
    model = DeepFM(deep_features=DENSE, fm_features=SPARSE, mlp_params={"dims": (8,), "dropout": 0.0})
    rng = np.random.default_rng(0)
    x = {f"C{i}": rng.integers(0, 40, 16).astype(np.int32) for i in range(3)}
    x["I0"] = rng.normal(size=16).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    return model, variables, x


def test_stablehlo_roundtrip_full(tmp_path):
    model, variables, x = ctr_model_and_input()
    exporter = StableHLOExporter(model, variables)
    path = exporter.export(str(tmp_path / "deepfm"), x)
    run, _ = load_exported(path)
    out = np.asarray(run(x))
    expected = np.asarray(model.apply(variables, x, training=False))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_stablehlo_tower_modes(tmp_path):
    user = (SparseFeature("user_id", vocab_size=30, embed_dim=8),)
    item = (SparseFeature("item_id", vocab_size=50, embed_dim=8),)
    model = DSSM(user_features=user, item_features=item, user_params={"dims": (8,)}, item_params={"dims": (8,)})
    rng = np.random.default_rng(0)
    x = {"user_id": rng.integers(0, 30, 8).astype(np.int32), "item_id": rng.integers(0, 50, 8).astype(np.int32)}
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    exporter = StableHLOExporter(model, variables)
    for mode in ("user", "item"):
        path = exporter.export(str(tmp_path / f"dssm_{mode}"), x, mode=mode)
        run, _ = load_exported(path)
        out = np.asarray(run(x))
        expected = np.asarray(model.apply(variables, x, training=False, mode=mode))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
        assert out.shape == (8, 8)


def test_quantize_int8_and_fp16():
    model, variables, x = ctr_model_and_input()
    err = quantization_error(variables["params"], "int8")
    assert err < 0.02  # int8 weight-only: <2% of max-abs per tensor
    deq = dequantize_params(quantize_params(variables["params"], "fp16"))
    p0 = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(deq)[0])
    np.testing.assert_allclose(p0, p1, rtol=1e-2, atol=1e-3)


def test_int8_model_outputs_close():
    model, variables, x = ctr_model_and_input()
    qparams = dequantize_params(quantize_params(variables["params"], "int8"))
    base = np.asarray(jax.nn.sigmoid(model.apply(variables, x, training=False)))
    quant = np.asarray(jax.nn.sigmoid(model.apply({"params": qparams, "batch_stats": variables.get("batch_stats", {})}, x, training=False)))
    np.testing.assert_allclose(base, quant, atol=0.05)


def test_quantized_export_roundtrip(tmp_path):
    """In-graph dequant artifact: serialized params are int8, the loaded
    StableHLO runs directly, outputs close to fp32 (reference quantizes the
    deployed ONNX model, ``utils/quantization.py:26-128``)."""
    import os

    model, variables, x = ctr_model_and_input()
    exporter = StableHLOExporter(model, variables)
    fp_path = exporter.export(str(tmp_path / "deepfm_fp32"), x)
    q_path = exporter.export_quantized(str(tmp_path / "deepfm_int8"), x, quant_mode="int8")
    run, qvars = load_exported(q_path)
    # serialized artifact actually shrinks: int8 leaves present
    leaves = jax.tree_util.tree_leaves(qvars["params"])
    assert any(getattr(l, "dtype", None) == np.int8 for l in leaves)
    fp_size = os.path.getsize(fp_path[: -len(".stablehlo")] + ".params.msgpack")
    q_size = os.path.getsize(q_path[: -len(".stablehlo")] + ".params.msgpack")
    assert q_size < fp_size
    out = np.asarray(run(x))
    expected = np.asarray(model.apply(variables, x, training=False))
    np.testing.assert_allclose(out, expected, atol=0.05)


def test_quantized_export_fp16_tower(tmp_path):
    user = (SparseFeature("user_id", vocab_size=30, embed_dim=8),)
    item = (SparseFeature("item_id", vocab_size=50, embed_dim=8),)
    model = DSSM(user_features=user, item_features=item, user_params={"dims": (8,)}, item_params={"dims": (8,)})
    rng = np.random.default_rng(0)
    x = {"user_id": rng.integers(0, 30, 8).astype(np.int32), "item_id": rng.integers(0, 50, 8).astype(np.int32)}
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    exporter = StableHLOExporter(model, variables)
    path = exporter.export_quantized(str(tmp_path / "dssm_user_fp16"), x, mode="user", quant_mode="fp16")
    run, _ = load_exported(path)
    expected = np.asarray(model.apply(variables, x, training=False, mode="user"))
    np.testing.assert_allclose(np.asarray(run(x)), expected, rtol=1e-2, atol=1e-3)


def test_trainer_export_and_visualization(tmp_path):
    """Trainer-level export()/visualization() (reference trainers' export_onnx
    + visualization methods, ``trainers/ctr_trainer.py:189-322``)."""
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import DataGenerator

    model, _, x = ctr_model_and_input()
    y = np.random.default_rng(1).integers(0, 2, 16).astype(np.float32)
    train_dl, _, _ = DataGenerator(x, y).generate_dataloader(batch_size=8)
    trainer = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path))
    trainer.fit(train_dl)

    path = trainer.export(str(tmp_path / "deepfm_trained"), x)
    run, _ = load_exported(path)
    expected = np.asarray(model.apply(trainer.variables(), x, training=False))
    np.testing.assert_allclose(np.asarray(run(x)), expected, rtol=1e-5, atol=1e-6)

    summary = trainer.visualization(save_path=str(tmp_path / "summary.txt"))
    assert "params" in summary.lower() or "total" in summary.lower()
    assert (tmp_path / "summary.txt").exists()


def test_match_trainer_tower_export(tmp_path):
    """Dual-tower export through the trainer (reference match_trainer.py:266-339)."""
    from torch_rechub_tpu.trainers import MatchTrainer
    from torch_rechub_tpu.utils.data import DataGenerator

    user = (SparseFeature("user_id", vocab_size=30, embed_dim=8),)
    item = (SparseFeature("item_id", vocab_size=50, embed_dim=8),)
    model = DSSM(user_features=user, item_features=item, user_params={"dims": (8,)}, item_params={"dims": (8,)})
    rng = np.random.default_rng(0)
    x = {"user_id": rng.integers(0, 30, 16).astype(np.int32), "item_id": rng.integers(0, 50, 16).astype(np.int32)}
    y = rng.integers(0, 2, 16).astype(np.float32)
    train_dl, _, _ = DataGenerator(x, y).generate_dataloader(batch_size=8)
    trainer = MatchTrainer(model, mode=0, n_epoch=1, model_path=str(tmp_path))
    trainer.fit(train_dl)
    for mode in ("user", "item"):
        path = trainer.export(str(tmp_path / f"dssm_{mode}"), x, mode=mode)
        run, _ = load_exported(path)
        expected = np.asarray(model.apply(trainer.variables(), x, training=False, mode=mode))
        np.testing.assert_allclose(np.asarray(run(x)), expected, rtol=1e-5, atol=1e-6)
