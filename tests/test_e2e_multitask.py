"""End-to-end multi-task tests: all 5 models x adaptive methods."""

import jax
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models import multi_task as mt
from torch_rechub_tpu.trainers.mtl_trainer import MTLTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

TASK_TYPES = ("classification", "classification")


def mtl_data(n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, 30, n).astype(np.int32) for i in range(4)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    ys = rng.integers(0, 2, (n, 2)).astype(np.float32)
    return x, ys


def features():
    return tuple(SparseFeature(f"C{i}", vocab_size=30, embed_dim=6) for i in range(4)) + (DenseFeature("I0"),)


def build(name):
    feats = features()
    towers = ({"dims": (8,)}, {"dims": (8,)})
    if name == "SharedBottom":
        return mt.SharedBottom(features=feats, task_types=TASK_TYPES, bottom_params={"dims": (16,)}, tower_params_list=towers)
    if name == "MMOE":
        return mt.MMOE(features=feats, task_types=TASK_TYPES, n_expert=3, expert_params={"dims": (16,)}, tower_params_list=towers)
    if name == "PLE":
        return mt.PLE(features=feats, task_types=TASK_TYPES, n_level=2, n_expert_specific=2, n_expert_shared=1, expert_params={"dims": (16,)}, tower_params_list=towers)
    if name == "AITM":
        return mt.AITM(features=feats, n_task=2, bottom_params={"dims": (16,)}, tower_params_list=towers)
    if name == "ESMM":
        user = feats[:2]
        item = feats[2:4]
        return mt.ESMM(user_features=user, item_features=item, cvr_params={"dims": (8,)}, ctr_params={"dims": (8,)})
    raise KeyError(name)


@pytest.mark.parametrize("model_name", ["SharedBottom", "MMOE", "PLE", "AITM", "ESMM"])
def test_mtl_models_fit(model_name):
    x, ys = mtl_data()
    task_types = ("classification",) * 3 if model_name == "ESMM" else TASK_TYPES
    if model_name == "ESMM":
        ys = np.concatenate([ys, (ys[:, :1] * ys[:, 1:2])], axis=1)  # cvr, ctr, ctcvr
    model = build(model_name)
    trainer = MTLTrainer(model, task_types, n_epoch=1, model_path="/tmp/rechub_mtl")
    dl = ArrayLoader(x, ys, batch_size=64, shuffle=True)
    val = ArrayLoader(x, ys, batch_size=64)
    log = trainer.fit(dl, val)
    assert len(log) >= 1
    preds = trainer.predict(model, val)
    assert preds.shape == (len(ys), len(task_types))
    assert np.isfinite(preds).all()


@pytest.mark.parametrize("method", ["uwl", "gradnorm", "metabalance"])
def test_adaptive_methods(method):
    x, ys = mtl_data()
    model = build("MMOE")
    trainer = MTLTrainer(model, TASK_TYPES, adaptive_params={"method": method}, n_epoch=2, model_path="/tmp/rechub_mtl")
    dl = ArrayLoader(x, ys, batch_size=64, shuffle=True)
    val = ArrayLoader(x, ys, batch_size=64)
    trainer.fit(dl, val)
    if method in ("uwl", "gradnorm"):
        w = np.asarray(trainer.state.loss_weight)
        assert w.shape == (2,)
        assert np.isfinite(w).all()
        if method == "gradnorm":
            np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-4)
    else:
        assert trainer.state.mb_norms is not None
        assert all(np.isfinite(np.asarray(n)).all() for n in trainer.state.mb_norms)


def test_shared_task_mask_classification():
    from torch_rechub_tpu.utils.mtl import is_shared_path

    assert is_shared_path("['embedding']['C0_table']")
    assert is_shared_path("['experts_0']['Dense_0']['kernel']")
    assert is_shared_path("['bottom_mlp']['Dense_0']['kernel']")
    assert not is_shared_path("['towers_0']['Dense_0']['kernel']")
    assert not is_shared_path("['gates_1']['Dense_0']['kernel']")
    assert not is_shared_path("['aits_0']['q_layer']['kernel']")


@pytest.mark.parametrize("method", [None, "uwl", "gradnorm", "metabalance"])
def test_steps_per_call_matches_single_step(method):
    """MTLTrainer(steps_per_call=N) is numerically equivalent to N single steps."""
    x, ys = mtl_data(n=128)
    adaptive = {"method": method} if method else None

    results = []
    for spc in (1, 4):
        model = build("MMOE")
        trainer = MTLTrainer(model, TASK_TYPES, adaptive_params=adaptive, n_epoch=1, model_path="/tmp/rechub_mtl_spc", seed=7, steps_per_call=spc)
        dl = ArrayLoader(x, ys, batch_size=32, shuffle=False)
        trainer.train_one_epoch(dl)
        results.append((jax.device_get(trainer.state.params), jax.device_get(getattr(trainer.state, "loss_weight", None))))

    (a, lw_a), (b, lw_b) = results
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-5)
    if lw_a is not None and lw_b is not None:
        np.testing.assert_allclose(lw_a, lw_b, rtol=2e-4, atol=2e-5)
