"""Sparse row-wise embedding updates: numerics vs dense, trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.ops.sparse_update import (
    init_accumulators,
    pair_sparse_grads,
    rowwise_adagrad_update,
    sparse_sgd_update,
    split_fused_tables,
)
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader


@pytest.fixture(autouse=True)
def _fuse_all_tables():
    """These tests use tiny vocabs; force-fuse so sparse hooks exist (the
    'auto' default only fuses tables >= 262144 rows)."""
    from torch_rechub_tpu.ops.embedding import set_fused_default

    old = set_fused_default(True)
    yield
    set_fused_default(old)


def test_sparse_sgd_matches_dense_sgd():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    ids = jnp.asarray([3, 7, 3, 0, 63, 7, 7])  # duplicates on purpose
    grads = jnp.asarray(rng.normal(size=(7, 8)).astype(np.float32))
    lr = 0.1
    dense_grad = jnp.zeros_like(table).at[ids].add(grads)
    expected = table - lr * dense_grad
    got = sparse_sgd_update(table, ids, grads, lr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-7)


def test_rowwise_adagrad_dedup_semantics():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(65, 4)).astype(np.float32))  # row 64 = spare
    accum = jnp.zeros((65,), jnp.float32)
    ids = jnp.asarray([2, 5, 2, 9])
    grads = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    lr, eps = 0.05, 1e-10

    new_table, new_accum = rowwise_adagrad_update(table, accum, ids, grads, lr, eps=eps)

    # dense reference: aggregate duplicate rows first, one accumulator update per row
    agg = np.zeros((65, 4), np.float32)
    for i, g in zip(np.asarray(ids), np.asarray(grads)):
        agg[i] += g
    touched = sorted(set(np.asarray(ids).tolist()))
    exp_table = np.array(table)
    exp_accum = np.zeros(65, np.float32)
    for r in touched:
        exp_accum[r] = np.mean(agg[r] ** 2)
        exp_table[r] -= lr / (np.sqrt(exp_accum[r]) + eps) * agg[r]

    np.testing.assert_allclose(np.asarray(new_accum), exp_accum, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_table), exp_table, rtol=1e-5, atol=1e-6)
    # untouched + spare rows unchanged
    untouched = [r for r in range(65) if r not in touched]
    np.testing.assert_allclose(np.asarray(new_table)[untouched], np.array(table)[untouched])


def build_ctr(n=256, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n).astype(np.int32) for i in range(4)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    logit = (x["C0"] % 2) * 2.0 - 1.0 + x["I0"]
    y = (logit + rng.normal(scale=0.5, size=n) > 0).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=vocab, embed_dim=8) for i in range(4))
    dense = (DenseFeature("I0"),)
    model = DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (16,), "dropout": 0.0})
    return model, x, y


def test_perturbation_grads_match_dense_table_grads():
    """scatter(ids, d loss/d rows) == the dense table gradient."""
    model, x, y = build_ctr()
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_sparse_chk", sparse_embedding="sgd")
    dl = ArrayLoader(x, y, batch_size=64, shuffle=False)
    trainer._ensure_ready(dl)

    xb, yb = next(iter(dl))
    xb = {k: jnp.asarray(v) for k, v in xb.items()}
    yb = jnp.asarray(yb, jnp.float32)
    w = jnp.ones((64,), jnp.float32)
    params = trainer.state.params
    bs = trainer.state.batch_stats
    rng = jax.random.PRNGKey(0)

    from torch_rechub_tpu.basic.loss import bce_with_logits

    def dense_loss(params):
        out, _ = model.apply({"params": params, "batch_stats": bs}, xb, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats"])
        return bce_with_logits(out, yb, w)

    dense_grads = jax.grad(dense_loss)(params)
    tables_dense, _ = split_fused_tables(dense_grads)

    # perturbation path
    tables_flat, rest_flat = split_fused_tables(params)
    from torch_rechub_tpu.ops.sparse_update import merge_params

    var_shapes = jax.eval_shape(lambda p, b, xx: model.apply({"params": p, "batch_stats": b}, xx, training=False, mutable=["perturbations"])[1], params, bs, xb)
    perts = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), var_shapes["perturbations"])

    def pert_loss(perts):
        out, mut = model.apply({"params": params, "batch_stats": bs, "perturbations": perts}, xb, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats", "embedding_ids"])
        return bce_with_logits(out, yb, w), mut["embedding_ids"]

    g_pert, ids_tree = jax.grad(pert_loss, has_aux=True)(perts)
    scattered = {k: jnp.zeros_like(v) for k, v in tables_flat.items()}
    for tkey, fids, fgrads in pair_sparse_grads(g_pert, ids_tree):
        scattered[tkey] = scattered[tkey].at[fids].add(fgrads)

    for tkey, dense in tables_dense.items():
        np.testing.assert_allclose(np.asarray(scattered[tkey]), np.asarray(dense), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["sgd", "adagrad"])
def test_sparse_trainer_learns(method):
    model, x, y = build_ctr(n=512)
    lr = {"sgd": 1e-2, "adagrad": 1e-3}[method]  # plain SGD rows need a larger lr
    trainer = CTRTrainer(model, n_epoch=3, model_path="/tmp/rechub_sparse_fit", sparse_embedding=method, steps_per_call=2, optimizer_params={"lr": lr})
    dl = ArrayLoader(x, y, batch_size=64, shuffle=False)
    first = trainer.train_one_epoch(dl)
    for _ in range(2):
        last = trainer.train_one_epoch(dl)
    assert last < first, (first, last)
    auc = trainer.evaluate(model, dl)
    assert auc > 0.6

    # unseen vocab rows (never in any batch) must be untouched by training
    tables_flat, _ = split_fused_tables(jax.device_get(trainer.state.params))
    # ids only cover [0, 64) per feature; fused rows beyond the last feature's
    # segment end are padding and must be exactly at init (zero grads)
    (tkey, table), = tables_flat.items()
    np.testing.assert_allclose(table[4 * 64:], 0.0)


def test_sparse_requires_fused():
    from torch_rechub_tpu.ops.embedding import set_fused_default

    model, x, y = build_ctr()
    old = set_fused_default(False)
    try:
        trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_sparse_nofuse", sparse_embedding="sgd")
        dl = ArrayLoader(x, y, batch_size=64)
        with pytest.raises(ValueError, match="fused"):
            trainer._ensure_ready(dl)
    finally:
        set_fused_default(old)


# ---------------------------------------------------------------------------
# round 5: sparse updates beyond CTRTrainer (MatchTrainer, SeqTrainer)
# ---------------------------------------------------------------------------

def build_match(n=256, seed=0):
    from torch_rechub_tpu.basic.features import SequenceFeature
    from torch_rechub_tpu.models import matching

    rng = np.random.default_rng(seed)
    n_items, d = 48, 8
    x = {
        "user_id": rng.integers(0, 32, n).astype(np.int32),
        "item_id": rng.integers(0, n_items, n).astype(np.int32),
        "hist_item_id": rng.integers(0, n_items, (n, 6)).astype(np.int32),
    }
    y = ((x["user_id"] + x["item_id"]) % 2).astype(np.float32)
    user = (
        SparseFeature("user_id", vocab_size=32, embed_dim=d),
        SequenceFeature("hist_item_id", vocab_size=n_items, embed_dim=d, pooling="mean", shared_with="item_id"),
    )
    item = (SparseFeature("item_id", vocab_size=n_items, embed_dim=d),)
    model = matching.DSSM(user_features=user, item_features=item, user_params={"dims": (16, d), "dropout": 0.0}, item_params={"dims": (16, d), "dropout": 0.0})
    return model, x, y


def test_match_sparse_sgd_exact_vs_dense_grad():
    """One MatchTrainer sparse-SGD step == table - lr * dense table gradient."""
    from torch_rechub_tpu.basic.loss import bce_with_logits
    from torch_rechub_tpu.trainers import MatchTrainer

    model, x, y = build_match()
    lr = 0.05
    trainer = MatchTrainer(model, mode=0, n_epoch=1, model_path="/tmp/rechub_match_sparse", sparse_embedding="sgd", optimizer_params={"lr": lr})
    dl = ArrayLoader(x, y, batch_size=len(y), shuffle=False)
    trainer._ensure_ready(dl)
    params0 = jax.device_get(trainer.state.params)
    bs0 = jax.device_get(trainer.state.batch_stats)

    xb = {k: jnp.asarray(v) for k, v in x.items()}
    yb = jnp.asarray(y, jnp.float32)
    w = jnp.ones_like(yb)
    rng = jax.random.PRNGKey(0)  # dropout=0 -> rng-independent

    def dense_loss(params):
        out, _ = model.apply({"params": params, "batch_stats": bs0}, xb, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats"])
        return bce_with_logits(out, yb, w)

    dense_tables, _ = split_fused_tables(jax.grad(dense_loss)(params0))

    trainer.train_one_epoch(dl, log_interval=0)
    new_tables, _ = split_fused_tables(jax.device_get(trainer.state.params))
    old_tables, _ = split_fused_tables(params0)
    for tkey, new in new_tables.items():
        expected = old_tables[tkey] - lr * np.asarray(dense_tables[tkey])
        np.testing.assert_allclose(np.asarray(new), expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["sgd", "adagrad"])
def test_match_sparse_inbatch_learns(method):
    from torch_rechub_tpu.trainers import MatchTrainer

    model, x, y = build_match(n=512)
    trainer = MatchTrainer(model, mode=2, in_batch_neg=True, n_epoch=2, model_path="/tmp/rechub_match_sparse_ib", sparse_embedding=method, steps_per_call=2, optimizer_params={"lr": 1e-2})
    yy = np.zeros(len(y), dtype=np.int64)
    dl = ArrayLoader(x, yy, batch_size=64, shuffle=False)
    first = trainer.train_one_epoch(dl, log_interval=0)
    last = trainer.train_one_epoch(dl, log_interval=0)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def seq_model_and_loader(tie=False, n=16, vocab=50, L=16):
    from torch_rechub_tpu.models.generative.hstu import HSTUModel
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(3)
    lengths = rng.integers(2, L + 1, n)
    toks = np.zeros((n, L), dtype=np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, vocab, l)
    tds = rng.integers(0, 86400, (n, L)).astype(np.int32)
    targets = rng.integers(1, vocab, n).astype(np.int32)
    pos = np.tile(np.arange(L), (n, 1))
    model = HSTUModel(vocab_size=vocab, d_model=32, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=L, dropout=0.0, num_time_buckets=8, tie_embeddings=tie)
    return model, SeqLoader(toks, pos, targets, tds, batch_size=n, shuffle=False), (toks, tds, targets)


def test_seq_sparse_requires_untied():
    from torch_rechub_tpu.trainers import SeqTrainer

    model, _, _ = seq_model_and_loader(tie=True)
    with pytest.raises(ValueError, match="tie_embeddings"):
        SeqTrainer(model, sparse_embedding="sgd")


def test_seq_sparse_sgd_exact_vs_dense_grad():
    """One SeqTrainer sparse-SGD step: token_embedding == table - lr * dense grad."""
    from torch_rechub_tpu.trainers import SeqTrainer

    model, dl, (toks, tds, targets) = seq_model_and_loader(tie=False)
    lr = 0.05
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_seq_sparse", sparse_embedding="sgd", optimizer_params={"lr": lr})
    trainer._ensure_ready(dl)
    params0 = jax.device_get(trainer.state.params)
    bs0 = jax.device_get(trainer.state.batch_stats)
    from torch_rechub_tpu.trainers.seq_trainer import next_token_loss

    def dense_loss(params):
        logits = model.apply({"params": params, "batch_stats": bs0, **trainer.const_vars}, jnp.asarray(toks), jnp.asarray(tds), training=True, rngs={"dropout": jax.random.PRNGKey(0)})
        return next_token_loss(logits, jnp.asarray(toks), jnp.asarray(targets), 1.0, 0)

    dense_grads = jax.grad(dense_loss)(params0)
    dense_tok = np.asarray(dense_grads["token_embedding"])

    trainer.train_one_epoch(dl)
    new_tok = np.asarray(jax.device_get(trainer.state.params)["token_embedding"])
    expected = params0["token_embedding"] - lr * dense_tok
    np.testing.assert_allclose(new_tok, expected, rtol=1e-5, atol=1e-6)
    # PAD row stays exactly zero
    np.testing.assert_allclose(new_tok[0], 0.0)


@pytest.mark.parametrize("method", ["sgd", "adagrad"])
def test_seq_sparse_learns_chunked(method):
    """Sparse input table + chunked CE (the large-vocab production combo)."""
    from torch_rechub_tpu.trainers import SeqTrainer

    model, dl, _ = seq_model_and_loader(tie=False, n=32)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_seq_sparse_fit", sparse_embedding=method, vocab_chunk_size=16, steps_per_call=2, optimizer_params={"lr": 1e-2})
    losses = [trainer.train_one_epoch(dl) for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def build_mtl(n=256, vocab=48, seed=0):
    from torch_rechub_tpu.models.multi_task import MMOE

    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n).astype(np.int32) for i in range(4)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    ys = np.stack([((x["C0"] + x["C1"]) % 2), ((x["C2"] % 2))], axis=1).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=vocab, embed_dim=8) for i in range(4))
    dense = (DenseFeature("I0"),)
    model = MMOE(features=sparse + dense, task_types=["classification", "classification"], n_expert=2, expert_params={"dims": (16,), "dropout": 0.0}, tower_params_list=[{"dims": (8,), "dropout": 0.0}, {"dims": (8,), "dropout": 0.0}])
    return model, x, ys


def test_mtl_sparse_sgd_exact_vs_dense_grad():
    """One MTLTrainer (mean aggregation) sparse-SGD step == dense table grad."""
    from torch_rechub_tpu.trainers.mtl_trainer import MTLTrainer, _task_loss

    model, x, ys = build_mtl()
    lr = 0.05
    trainer = MTLTrainer(model, ["classification", "classification"], n_epoch=1, model_path="/tmp/rechub_mtl_sparse", sparse_embedding="sgd", optimizer_params={"lr": lr})
    dl = ArrayLoader(x, ys, batch_size=len(ys), shuffle=False)
    trainer._ensure_ready(dl)
    params0 = jax.device_get(trainer.state.params)
    bs0 = jax.device_get(trainer.state.batch_stats)

    xb = {k: jnp.asarray(v) for k, v in x.items()}
    yb = jnp.asarray(ys, jnp.float32)
    w = jnp.ones(len(ys), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def dense_loss(params):
        out, _ = model.apply({"params": params, "batch_stats": bs0}, xb, training=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        ll = jnp.stack([_task_loss(out[:, i], yb[:, i], "classification", w) for i in range(2)])
        return jnp.mean(ll)

    dense_tables, _ = split_fused_tables(jax.grad(dense_loss)(params0))

    trainer.train_one_epoch(dl, log_interval=0)
    new_tables, _ = split_fused_tables(jax.device_get(trainer.state.params))
    old_tables, _ = split_fused_tables(params0)
    for tkey, new in new_tables.items():
        expected = old_tables[tkey] - lr * np.asarray(dense_tables[tkey])
        np.testing.assert_allclose(np.asarray(new), expected, rtol=1e-5, atol=1e-6)


def test_mtl_sparse_uwl_learns_and_gradnorm_raises():
    from torch_rechub_tpu.trainers.mtl_trainer import MTLTrainer

    model, x, ys = build_mtl(n=512)
    with pytest.raises(ValueError, match="gradnorm"):
        MTLTrainer(model, ["classification", "classification"], adaptive_params={"method": "gradnorm"}, sparse_embedding="adagrad")

    trainer = MTLTrainer(model, ["classification", "classification"], adaptive_params={"method": "uwl"}, n_epoch=2, model_path="/tmp/rechub_mtl_uwl_sparse", sparse_embedding="adagrad", steps_per_call=2, optimizer_params={"lr": 1e-2})
    dl = ArrayLoader(x, ys, batch_size=64, shuffle=False)
    first = trainer.train_one_epoch(dl, log_interval=0)
    last = trainer.train_one_epoch(dl, log_interval=0)
    first, last = np.mean(first), np.mean(last)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)
