"""bf16 mixed-precision policy: dtype flow, f32 params, quality parity.

The policy (``basic/precision.py``) is bf16 compute / f32 params+losses.
These tests pin: (a) the scope actually switches compute dtype and restores
it, (b) params and optimizer state stay f32 under bf16 training, (c) training
quality matches f32 within tolerance on learnable synthetic data, (d) the
HSTU attention op accepts bf16 q/k/v with f32 table grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.basic.precision import compute_dtype, precision_scope, set_precision
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import DataGenerator


def _learnable_ctr(n=4096, seed=7):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, 64, n).astype(np.int32) for i in range(5)}
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(3)})
    logit = (x["C0"] % 2) * 2.0 - 1.0 + 1.5 * x["I0"]
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
    return x, y


def _features():
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=64, embed_dim=8) for i in range(5))
    dense = tuple(DenseFeature(f"I{i}") for i in range(3))
    return sparse, dense


def test_scope_switches_and_restores():
    assert compute_dtype() == jnp.float32
    with precision_scope("bf16"):
        assert compute_dtype() == jnp.bfloat16
        with precision_scope("f32"):
            assert compute_dtype() == jnp.float32
        assert compute_dtype() == jnp.bfloat16
    assert compute_dtype() == jnp.float32
    with pytest.raises(ValueError):
        set_precision("fp8")


def test_bf16_apply_dtype_and_f32_params():
    sparse, dense = _features()
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (16,), "dropout": 0.0, "activation": "relu"})
    x = {f"C{i}": np.zeros(4, np.int32) for i in range(5)}
    x.update({f"I{i}": np.zeros(4, np.float32) for i in range(3)})
    with precision_scope("bf16"):
        v = model.init(jax.random.PRNGKey(0), x, training=False)
        out = model.apply(v, x, training=False)
    assert out.dtype == jnp.bfloat16
    assert {str(l.dtype) for l in jax.tree_util.tree_leaves(v["params"])} == {"float32"}
    # f32 apply of the same params gives close values
    out32 = model.apply(v, x, training=False)
    assert out32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(out32), atol=3e-2, rtol=3e-2)


def test_bf16_training_quality_parity():
    """AUC under bf16 within run-to-run variance of f32 on learnable data."""
    x, y = _learnable_ctr()
    aucs = {}
    for prec in (None, "bf16"):
        sparse, dense = _features()
        model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (32,), "dropout": 0.0, "activation": "relu"})
        tr, va, te = DataGenerator(x, y).generate_dataloader(split_ratio=[0.7, 0.1], batch_size=512)
        t = CTRTrainer(model, n_epoch=3, model_path=f"/tmp/prec_{prec}", precision=prec, seed=0)
        t.fit(tr, None, log_interval=0)
        aucs[prec] = t.evaluate(model, te)
        dtypes = {str(l.dtype) for l in jax.tree_util.tree_leaves(t.state.params)}
        assert dtypes == {"float32"}, (prec, dtypes)
        opt_dtypes = {str(l.dtype) for l in jax.tree_util.tree_leaves(t.state.opt_state) if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)}
        assert opt_dtypes <= {"float32"}, (prec, opt_dtypes)
    assert aucs["bf16"] > 0.65
    assert abs(aucs["bf16"] - aucs[None]) < 0.05, aucs


def test_invalid_precision_rejected_eagerly():
    sparse, dense = _features()
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (16,)})
    with pytest.raises(ValueError):
        CTRTrainer(model, precision="fp8")


def test_hstu_attention_bf16_inputs():
    """bf16 q/k/v through the rab attention op: bf16 out, f32 table grads,
    values close to the f32 path (interpret-mode Pallas on CPU)."""
    from torch_rechub_tpu.ops.pallas import hstu_rab_attention as mod

    b, h, l, d = 2, 2, 16, 8
    rng = np.random.default_rng(0)
    q = rng.normal(size=(b, h, l, d)).astype(np.float32) * 0.5
    k = rng.normal(size=(b, h, l, d)).astype(np.float32) * 0.5
    v = rng.normal(size=(b, h, l, d)).astype(np.float32) * 0.5
    pos_w = rng.normal(size=(2 * l - 1, h)).astype(np.float32) * 0.1
    ts_w = rng.normal(size=(9, h)).astype(np.float32) * 0.1
    ts = np.sort(rng.integers(0, 1000, (b, l))).astype(np.int32)
    mask = np.ones((b, l), bool)
    cfg = mod.BucketCfg(num_buckets=8, fn="sqrt", divisor=1.0, unit="seconds")
    mod._FORCE_INTERPRET[0] = True  # exercise the REAL kernels (interpreted) on CPU

    def run(dtype):
        qq, kk, vv = (jnp.asarray(a, dtype) for a in (q, k, v))

        def f(qq, kk, vv, pw, tw):
            out = mod.hstu_attention_rab(qq, kk, vv, pw, tw, jnp.asarray(ts), jnp.asarray(mask), 0.35, l, cfg, 8, 8)
            return jnp.sum(out.astype(jnp.float32) ** 2), out

        (loss, out), grads = jax.value_and_grad(f, argnums=(3, 4), has_aux=True)(qq, kk, vv, jnp.asarray(pos_w), jnp.asarray(ts_w))
        return out, grads

    try:
        out32, g32 = run(jnp.float32)
        out16, g16 = run(jnp.bfloat16)
    finally:
        mod._FORCE_INTERPRET[0] = False
    assert out16.dtype == jnp.bfloat16
    assert g16[0].dtype == jnp.float32 and g16[1].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16, np.float32), np.asarray(out32), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(g16[0]), np.asarray(g32[0]), atol=8e-2, rtol=1.5e-1)


def test_chunked_ce_bf16_close_to_f32():
    from torch_rechub_tpu.ops.chunked_ce import chunked_next_token_loss

    rng = np.random.default_rng(1)
    b, l, d, vocab = 4, 12, 16, 300
    hidden = rng.normal(size=(b, l, d)).astype(np.float32) * 0.3
    weight = rng.normal(size=(vocab, d)).astype(np.float32) * 0.3
    toks = rng.integers(1, vocab, (b, l)).astype(np.int32)
    tgts = rng.integers(1, vocab, b).astype(np.int32)
    l32 = chunked_next_token_loss(jnp.asarray(hidden), jnp.asarray(weight), jnp.asarray(toks), jnp.asarray(tgts), chunk_size=64)
    l16 = chunked_next_token_loss(jnp.asarray(hidden, jnp.bfloat16), jnp.asarray(weight), jnp.asarray(toks), jnp.asarray(tgts), chunk_size=64)
    assert l16.dtype == jnp.float32  # loss always f32
    np.testing.assert_allclose(float(l16), float(l32), atol=3e-2, rtol=1e-2)


def test_bf16_match_trainer_inbatch():
    """MatchTrainer under bf16: in-batch list-wise training runs, towers emit
    f32 embeddings (cast at the predict/tower boundary), params stay f32."""
    from torch_rechub_tpu.models.matching import DSSM
    from torch_rechub_tpu.trainers.match_trainer import MatchTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(0)
    n = 256
    x = {
        "user_id": rng.integers(0, 50, n).astype(np.int32),
        "movie_id": rng.integers(0, 80, n).astype(np.int32),
    }
    y = np.zeros(n, np.int64)
    user_f = (SparseFeature("user_id", 50, embed_dim=8),)
    item_f = (SparseFeature("movie_id", 80, embed_dim=8),)
    model = DSSM(user_features=user_f, item_features=item_f, user_params={"dims": (16,), "dropout": 0.0}, item_params={"dims": (16,), "dropout": 0.0})
    t = MatchTrainer(model, mode=2, in_batch_neg=True, in_batch_neg_ratio=4, n_epoch=1, model_path="/tmp/prec_match", precision="bf16")
    loss = t.train_one_epoch(ArrayLoader(x, y, batch_size=64), log_interval=0)
    assert np.isfinite(loss)
    emb = t.inference_embedding(model, "user", ArrayLoader(x, batch_size=64), "")
    assert emb.dtype == np.float32
    assert {str(l.dtype) for l in jax.tree_util.tree_leaves(t.state.params)} == {"float32"}


@pytest.mark.parametrize("method", ["uwl", "metabalance"])
def test_bf16_mtl_trainer(method):
    from torch_rechub_tpu.models.multi_task import MMOE
    from torch_rechub_tpu.trainers.mtl_trainer import MTLTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(1)
    n = 256
    x = {f"C{i}": rng.integers(0, 30, n).astype(np.int32) for i in range(3)}
    ys = rng.integers(0, 2, (n, 2)).astype(np.float32)
    feats = tuple(SparseFeature(f"C{i}", 30, embed_dim=6) for i in range(3))
    model = MMOE(features=feats, task_types=("classification", "classification"), n_expert=2, expert_params={"dims": (8,), "dropout": 0.0}, tower_params_list=({"dims": (4,)}, {"dims": (4,)}))
    t = MTLTrainer(model, ("classification", "classification"), adaptive_params={"method": method}, n_epoch=1, model_path="/tmp/prec_mtl", precision="bf16")
    losses = t.train_one_epoch(ArrayLoader(x, ys, batch_size=64), log_interval=0)
    assert np.all(np.isfinite(losses))
    assert {str(l.dtype) for l in jax.tree_util.tree_leaves(t.state.params)} == {"float32"}


def test_bf16_seq_trainer_chunked():
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(2)
    n, l, vocab = 32, 8, 300
    toks = rng.integers(1, vocab, (n, l)).astype(np.int32)
    pos = np.broadcast_to(np.arange(l, dtype=np.int32), (n, l)).copy()
    tds = np.zeros((n, l), np.int32)
    tgts = rng.integers(1, vocab, n).astype(np.int32)
    model = HSTUModel(vocab_size=vocab, d_model=16, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=l, dropout=0.0)
    t = SeqTrainer(model, n_epoch=1, model_path="/tmp/prec_seq", vocab_chunk_size=128, precision="bf16")
    loader = SeqLoader(toks, pos, tgts, tds, batch_size=16)
    loss = t.train_one_epoch(loader, log_interval=0)
    assert np.isfinite(loss)
    vloss, acc = t.evaluate(loader)
    assert np.isfinite(vloss) and 0.0 <= acc <= 1.0
    assert {str(l.dtype) for l in jax.tree_util.tree_leaves(t.state.params)} == {"float32"}
