"""Unit tests for feature schema, embedding collection, and core layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SequenceFeature, SparseFeature, auto_embedding_dim
from torch_rechub_tpu.basic.layers import FM, MLP, CrossNetMix, CrossNetV2, CrossNetwork, SENETLayer
from torch_rechub_tpu.basic.loss import RegularizationLoss, bce_with_logits, bpr_loss, nce_loss
from torch_rechub_tpu.basic.metric import auc_score, gauc_score, log_loss, topk_metrics
from torch_rechub_tpu.ops.embedding import EmbeddingCollection


def test_auto_embedding_dim():
    assert auto_embedding_dim(10000) == 60
    assert auto_embedding_dim(16) == 12


def test_feature_schema_hashable():
    f = SparseFeature("a", 100, embed_dim=8)
    assert hash(f)
    assert f.embed_dim == 8
    g = SparseFeature("b", 10000)
    assert g.embed_dim == auto_embedding_dim(10000)


def test_embedding_collection_shapes():
    feats = (
        SparseFeature("cat", 50, embed_dim=8),
        SparseFeature("cat_shared", 50, embed_dim=8, shared_with="cat"),
        SequenceFeature("hist", 50, embed_dim=8, pooling="mean", shared_with="cat", padding_idx=0),
        DenseFeature("price"),
    )
    coll = EmbeddingCollection(features=feats, fused=False)
    x = {
        "cat": jnp.array([1, 2, 3]),
        "cat_shared": jnp.array([1, 2, 3]),
        "hist": jnp.array([[1, 2, 0], [3, 0, 0], [0, 0, 0]]),
        "price": jnp.array([0.5, 1.0, -1.0]),
    }
    variables = coll.init(jax.random.PRNGKey(0), x, feats[:3])
    # single shared table only
    assert list(variables["params"].keys()) == ["cat_table"]
    out = coll.apply(variables, x, feats[:3])
    assert out.shape == (3, 3, 8)
    flat = coll.apply(variables, x, feats, squeeze_dim=True)
    assert flat.shape == (3, 3 * 8 + 1)


def test_embedding_padding_semantics():
    """padding_idx rows read as zero and receive no gradient."""
    feats = (SequenceFeature("hist", 10, embed_dim=4, pooling="sum", padding_idx=0),)
    coll = EmbeddingCollection(features=feats, fused=False)
    x = {"hist": jnp.array([[1, 0, 0]])}
    variables = coll.init(jax.random.PRNGKey(0), x, feats)
    table = variables["params"]["hist_table"]
    np.testing.assert_allclose(table[0], 0.0)

    def loss(params):
        out = coll.apply({"params": params}, x, feats)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    np.testing.assert_allclose(np.asarray(grads["hist_table"][0]), 0.0)
    assert np.abs(np.asarray(grads["hist_table"][1])).sum() > 0


def test_mean_pooling_matches_manual():
    feats = (SequenceFeature("hist", 10, embed_dim=4, pooling="mean", padding_idx=0),)
    coll = EmbeddingCollection(features=feats, fused=False)
    x = {"hist": jnp.array([[1, 2, 0, 0]])}
    variables = coll.init(jax.random.PRNGKey(0), x, feats)
    table = np.asarray(variables["params"]["hist_table"])
    out = np.asarray(coll.apply(variables, x, feats))[0, 0]
    np.testing.assert_allclose(out, (table[1] + table[2]) / 2, rtol=1e-5)


def test_fm_hand_computed():
    # FM of [[1,0],[0,1]] per batch: 0.5*((sum)^2 - sum(sq)) = 0.5*((1,1)^2-(1,1)) = (0,0) -> x=[[1,2],[3,4]]
    x = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])
    fm = FM(reduce_sum=True)
    out = fm.apply(fm.init(jax.random.PRNGKey(0), x), x)
    # square_of_sum = (4,6)^2 = (16,36); sum_of_square = (10,20); ix = (6,16); 0.5*22 = 11
    np.testing.assert_allclose(np.asarray(out), [[11.0]], rtol=1e-6)


@pytest.mark.parametrize("cls,kwargs", [(CrossNetwork, {"num_layers": 2}), (CrossNetV2, {"num_layers": 2}), (CrossNetMix, {"num_layers": 2, "low_rank": 4, "num_experts": 2})])
def test_crossnets_shapes(cls, kwargs):
    x = jnp.ones((5, 16))
    m = cls(**kwargs)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_batchnorm_and_dropout():
    x = jnp.ones((8, 16))
    m = MLP(dims=(8, 4), dropout=0.5)
    v = m.init(jax.random.PRNGKey(0), x, training=False)
    assert "batch_stats" in v
    out, mutated = m.apply(v, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    assert out.shape == (8, 1)
    eval_out = m.apply(v, x, training=False)
    assert eval_out.shape == (8, 1)


def test_senet_shapes():
    x = jnp.ones((4, 6, 8))
    m = SENETLayer(num_fields=6)
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (4, 6, 8)


# -- losses ------------------------------------------------------------------


def test_bce_with_logits_matches_manual():
    logits = jnp.array([0.0, 2.0, -2.0])
    y = jnp.array([1.0, 1.0, 0.0])
    expected = float(np.mean([np.log(2), np.log1p(np.exp(-2)), np.log1p(np.exp(-2))]))
    np.testing.assert_allclose(float(bce_with_logits(logits, y)), expected, rtol=1e-4)


def test_bce_weighted_padding_invariance():
    logits = jnp.array([0.3, -1.2, 9.9])
    y = jnp.array([1.0, 0.0, 1.0])
    w = jnp.array([1.0, 1.0, 0.0])
    unpadded = bce_with_logits(logits[:2], y[:2])
    padded = bce_with_logits(logits, y, w)
    np.testing.assert_allclose(float(padded), float(unpadded), rtol=1e-6)


def test_bpr_loss_shapes():
    assert float(bpr_loss(jnp.array([1.0]), jnp.array([0.0]))) > 0
    assert float(bpr_loss(jnp.array([1.0, 2.0]), jnp.array([[0.0, 0.5], [1.0, -1.0]]))) > 0


def test_nce_loss_ignore_index():
    logits = jnp.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    targets = jnp.array([0, 2])  # first ignored
    full = nce_loss(logits, targets, ignore_index=0)
    only_second = nce_loss(logits[1:], targets[1:], ignore_index=0)
    np.testing.assert_allclose(float(full), float(only_second), rtol=1e-6)


def test_regularization_classifies_paths():
    params = {
        "EmbeddingCollection_0": {"item_table": jnp.ones((4, 2))},
        "Dense_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "BatchNorm_0": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
    }
    reg = RegularizationLoss(embedding_l2=1.0, dense_l2=0.0)
    np.testing.assert_allclose(float(reg(params)), 8.0)
    reg2 = RegularizationLoss(dense_l2=1.0)
    np.testing.assert_allclose(float(reg2(params)), 6.0)  # norm skipped


# -- metrics -----------------------------------------------------------------


def test_auc_matches_sklearn_when_available():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 200)
    p = rng.random(200)
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        pytest.skip("sklearn unavailable")
    np.testing.assert_allclose(auc_score(y, p), roc_auc_score(y, p), rtol=1e-9)
    # with ties
    p_tied = np.round(p, 1)
    np.testing.assert_allclose(auc_score(y, p_tied), roc_auc_score(y, p_tied), rtol=1e-9)


def test_gauc_simple():
    y = [1, 0, 1, 0]
    p = [0.9, 0.1, 0.2, 0.8]
    users = [0, 0, 1, 1]
    np.testing.assert_allclose(gauc_score(y, p, users), 0.5)


def test_topk_metrics_reference_format():
    y_pred = {"0": [0, 1], "1": [0, 1], "2": [2, 3]}
    y_true = {"0": [1, 2], "1": [0, 1, 2], "2": [2, 3]}
    out = topk_metrics(y_true, y_pred, topKs=[2])
    assert out["Hit"] == ["Hit@2: 0.7143"]  # 5 hits / 7 gts
    assert out["Precision"] == ["Precision@2: 0.8333"]
    assert out["Recall"][0].startswith("Recall@2:")


def test_log_loss():
    np.testing.assert_allclose(log_loss(np.array([1.0, 0.0]), np.array([0.9, 0.1])), -np.log(0.9), rtol=1e-6)


def test_embedding_optimizer_split():
    """embedding_optimizer routes table updates through a different transform."""
    import jax
    import jax.numpy as jnp

    from torch_rechub_tpu.trainers.base import make_optimizer

    params = {"EmbeddingCollection_0": {"a_table": jnp.ones((4, 2))}, "Dense_0": {"kernel": jnp.ones((2, 2))}}
    tx, lr = make_optimizer({"lr": 1e-3, "weight_decay": 0.0, "embedding_optimizer": "sgd"})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda a: 2.0 * jnp.ones_like(a), params)
    updates, _ = tx.update(grads, state, params)
    # sgd on embeddings passes the raw grad (2.0); adam normalizes to ~1.0
    np.testing.assert_allclose(np.asarray(updates["EmbeddingCollection_0"]["a_table"]), 2.0)
    assert np.abs(np.asarray(updates["Dense_0"]["kernel"])).max() < 1.5


def test_steps_per_call_scan_matches_single_step():
    """Device-side multi-step scan == per-step dispatch (dropout off)."""
    import jax
    import numpy as np

    from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DeepFM
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(0)
    n = 96
    x = {f"C{i}": rng.integers(0, 50, n).astype(np.int32) for i in range(3)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=50, embed_dim=8) for i in range(3))
    dense = (DenseFeature("I0"),)

    def run(steps_per_call):
        model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (16,), "dropout": 0.0})
        tr = CTRTrainer(model, n_epoch=2, model_path="/tmp/rechub_scan", seed=0, steps_per_call=steps_per_call)
        dl = ArrayLoader(x, y, batch_size=32, shuffle=False)
        losses = [tr.train_one_epoch(dl) for _ in range(2)]
        return losses, jax.device_get(tr.state.params)

    l1, p1 = run(1)
    l4, p4 = run(4)
    np.testing.assert_allclose(l1, l4, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
