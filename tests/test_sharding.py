"""SPMD correctness: sharded == unsharded numerics on the 8-device CPU mesh.

The upgrade over the reference's test strategy (it has no multi-device tests,
``SURVEY.md §4``): the same train step must produce identical losses and
parameters whether run on 1 device or sharded over a (data, model) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.parallel import create_mesh
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

VOCAB = 64  # divisible by model-axis sizes


def data(n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, VOCAB, n).astype(np.int32) for i in range(4)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


def build_model():
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=VOCAB, embed_dim=8) for i in range(4))
    dense = (DenseFeature("I0"),)
    return DeepFM(deep_features=dense, fm_features=sparse, mlp_params={"dims": (16,), "dropout": 0.0})


def train_losses(mesh, n_steps=4):
    x, y = data()
    model = build_model()
    trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard", seed=7, mesh=mesh)
    loader = ArrayLoader(x, y, batch_size=64, shuffle=False)
    trainer._ensure_ready(loader)
    losses = []
    for i, (xb, yb) in enumerate(loader):
        if i >= n_steps:
            break
        xb = trainer.place_batch({k: jnp.asarray(v) for k, v in xb.items()})
        rng = jax.random.PRNGKey(0)
        trainer.state, loss = trainer._train_step(trainer.state, xb, jnp.asarray(yb), jnp.ones(64, jnp.float32), jnp.asarray(1e-3), rng)
        losses.append(float(loss))
    return losses, jax.device_get(trainer.state.params)


def test_requires_8_devices():
    assert jax.device_count() >= 8, "conftest must provide the virtual 8-device CPU mesh"


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_unsharded(mesh_shape):
    base_losses, base_params = train_losses(mesh=None)
    mesh = create_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sh_losses, sh_params = train_losses(mesh=mesh)
    np.testing.assert_allclose(base_losses, sh_losses, rtol=2e-4, atol=1e-5)
    # atol 2e-3 (~2*lr): a Dense bias feeding BatchNorm has mathematically
    # zero gradient (BN is shift-invariant), so Adam normalizes float noise
    # to +-lr steps for that one degenerate parameter; every other leaf
    # matches to ~1e-7.
    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2.5e-3, err_msg=str(p1))


def test_embedding_tables_actually_sharded():
    """Fused tables ALWAYS row-shard over the model axis (the placement
    policy force-shards them; tiny per-feature tables replicate instead —
    see tests/test_table_placement.py for the full policy)."""
    from torch_rechub_tpu.ops.embedding import set_fused_default

    mesh = create_mesh(data=4, model=2)
    x, y = data(n=64)
    old = set_fused_default(True)
    try:
        model = build_model()
        trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard", mesh=mesh)
        trainer._ensure_ready(ArrayLoader(x, y, batch_size=64))
    finally:
        set_fused_default(old)
    tables = [
        (jax.tree_util.keystr(p), leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
        if "_table" in jax.tree_util.keystr(p)
    ]
    # fused layout: all 4 feature tables live in one fused param; every
    # table param must be row-sharded over the model axis
    assert tables, "no embedding tables found"
    for name, leaf in tables:
        assert not leaf.sharding.is_fully_replicated, f"{name} stayed replicated"
    total_rows = sum(leaf.shape[0] for _, leaf in tables)
    assert total_rows >= 4 * VOCAB


def test_inbatch_negatives_span_global_batch():
    """Under SPMD the in-batch (B, B) score matrix is the GLOBAL batch: the
    negative pool spans every shard (upgrade over DDP-style per-host pools,
    reference ``match_trainer.py:118-138`` is single-process).  Sharded run
    must match the unsharded one exactly."""
    from torch_rechub_tpu.basic.features import SequenceFeature
    from torch_rechub_tpu.models import matching
    from torch_rechub_tpu.trainers import MatchTrainer

    rng = np.random.default_rng(0)
    n, d = 128, 8
    user_feats = (SparseFeature("user_id", vocab_size=64, embed_dim=d),)
    item_feats = (SparseFeature("item_id", vocab_size=64, embed_dim=d),)
    x = {
        "user_id": rng.integers(0, 64, n).astype(np.int32),
        "item_id": rng.integers(0, 64, n).astype(np.int32),
    }
    y = np.ones(n, np.float32)

    def run(mesh):
        model = matching.DSSM(user_features=user_feats, item_features=item_feats, user_params={"dims": (16, d)}, item_params={"dims": (16, d)})
        tr = MatchTrainer(model, mode=2, in_batch_neg=True, in_batch_neg_ratio=7, n_epoch=1, model_path="/tmp/rechub_ibn_shard", seed=3, mesh=mesh)
        from torch_rechub_tpu.utils.data import ArrayLoader

        dl = ArrayLoader(x, y, batch_size=64, shuffle=False)
        losses = [tr.train_one_epoch(dl) for _ in range(2)]
        return losses

    base = run(None)
    sharded = run(create_mesh(data=8, model=1))
    np.testing.assert_allclose(base, sharded, rtol=2e-4, atol=1e-5)


def test_brute_force_topk_sharded_matches():
    from torch_rechub_tpu.serving import brute_force_topk

    mesh = create_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    users = rng.normal(size=(32, 16)).astype(np.float32)
    items = rng.normal(size=(400, 16)).astype(np.float32)
    idx0, val0 = brute_force_topk(users, items, 10)
    idx1, val1 = brute_force_topk(users, items, 10, mesh=mesh)
    np.testing.assert_array_equal(idx0, idx1)
    np.testing.assert_allclose(val0, val1, rtol=1e-5)


def test_scan_steps_sharded_matches_unsharded():
    """steps_per_call>1 under a (data, model) mesh == single-device scan."""
    x, y = data()

    def run(mesh):
        model = build_model()
        tr = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard_scan", seed=7, mesh=mesh, steps_per_call=4)
        dl = ArrayLoader(x, y, batch_size=64, shuffle=False)
        # Compare the training TRAJECTORY (per-epoch losses), not raw params:
        # Adam amplifies reduction-order roundoff (~1e-7) on near-zero-moment
        # embedding rows into visible param noise, while the trajectory stays
        # equal to float tolerance.
        return [tr.train_one_epoch(dl) for _ in range(3)]

    l_ref = run(None)
    l_mesh = run(create_mesh(data=4, model=2))
    np.testing.assert_allclose(l_ref, l_mesh, rtol=1e-4)


def test_local_pool_inbatch_loss_exact():
    """``neg_pool='local'``: shard_map per-shard pools == hand-computed blocks.

    Each data shard samples negatives only from its own (b, b) score block
    with a shard-unique key; shard losses combine as psum(weighted sums).
    Reproduce that by slicing the batch into blocks on one device.
    """
    from torch_rechub_tpu.utils.match import (
        gather_inbatch_logits,
        inbatch_negative_sampling,
        inbatch_loss_from_logits,
        local_inbatch_loss,
    )

    rng = np.random.default_rng(5)
    n_data, b, d, k = 4, 16, 8, 5
    user = jnp.asarray(rng.normal(size=(n_data * b, d)).astype(np.float32))
    item = jnp.asarray(rng.normal(size=(n_data * b, d)).astype(np.float32))
    w = jnp.asarray((rng.random(n_data * b) > 0.2).astype(np.float32))
    key = jax.random.PRNGKey(11)
    mesh = create_mesh(data=n_data, model=2)

    for mode in (1, 2):
        got = float(local_inbatch_loss(user, item, w, key, mesh, mode, neg_ratio=k))
        loss_sum, w_sum = 0.0, 0.0
        for i in range(n_data):
            u_i, it_i, w_i = user[i * b:(i + 1) * b], item[i * b:(i + 1) * b], w[i * b:(i + 1) * b]
            scores = u_i @ it_i.T
            neg_idx = inbatch_negative_sampling(scores, neg_ratio=k, rng=jax.random.fold_in(key, i))
            logits = gather_inbatch_logits(scores, neg_idx)
            ls, ws = inbatch_loss_from_logits(logits, mode, weight=w_i)
            loss_sum += float(ls)
            w_sum += float(ws)
        np.testing.assert_allclose(got, loss_sum / w_sum, rtol=1e-5)


def test_match_trainer_local_pool_trains():
    """MatchTrainer(neg_pool='local') trains under a data-sharded mesh."""
    from torch_rechub_tpu.basic.features import SequenceFeature  # noqa: F401
    from torch_rechub_tpu.models import matching
    from torch_rechub_tpu.trainers import MatchTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(0)
    n, d = 128, 8
    user_feats = (SparseFeature("user_id", vocab_size=64, embed_dim=d),)
    item_feats = (SparseFeature("item_id", vocab_size=64, embed_dim=d),)
    x = {
        "user_id": rng.integers(0, 64, n).astype(np.int32),
        "item_id": rng.integers(0, 64, n).astype(np.int32),
    }
    y = np.ones(n, np.float32)
    model = matching.DSSM(user_features=user_feats, item_features=item_feats, user_params={"dims": (16, d)}, item_params={"dims": (16, d)})
    tr = MatchTrainer(model, mode=2, in_batch_neg=True, in_batch_neg_ratio=7, neg_pool="local", n_epoch=1, model_path="/tmp/rechub_ibn_local", seed=3, mesh=create_mesh(data=4, model=2), steps_per_call=2)
    dl = ArrayLoader(x, y, batch_size=64, shuffle=False)
    losses = [tr.train_one_epoch(dl) for _ in range(3)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it actually learns

    with pytest.raises(ValueError):
        MatchTrainer(model, neg_pool="nope")


# ---------------------------------------------------------------------------
# Round-4: sharded == unsharded for the OTHER trainer families
# (VERDICT r3 item 3 — SeqTrainer's vocab-sharded chunked CE and MTLTrainer's
# per-task gradient surgery are easy to get subtly wrong under a mesh).
# ---------------------------------------------------------------------------


def _seq_losses(mesh, vocab=65536, n=32, l=8, steps=3):
    """Few HSTU SeqTrainer steps; vocab >= SHARD_MIN_ROWS so the tied token
    table row-shards over `model` and the chunked CE runs vocab-sharded."""
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, vocab, (n, l)).astype(np.int32)
    positions = np.broadcast_to(np.arange(l, dtype=np.int32), (n, l)).copy()
    tds = np.sort(rng.integers(0, 10**5, (n, l)), axis=1).astype(np.int32)
    targets = rng.integers(1, vocab, n).astype(np.int32)

    model = HSTUModel(vocab_size=vocab, d_model=16, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=l, dropout=0.0, use_time_embedding=True)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard_seq", mesh=mesh, seed=5, vocab_chunk_size=8192, steps_per_call=1)
    loader = SeqLoader(tokens, positions, targets, tds, batch_size=n // steps if n % steps == 0 else 8, shuffle=False)
    loss = trainer.train_one_epoch(loader, log_interval=0)
    return loss, jax.device_get(trainer.state.params)


def test_seq_trainer_sharded_matches_unsharded():
    base_loss, base_params = _seq_losses(mesh=None)
    mesh = create_mesh(data=4, model=2)
    sh_loss, sh_params = _seq_losses(mesh=mesh)
    np.testing.assert_allclose(base_loss, sh_loss, rtol=3e-4)
    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-4, err_msg=str(p1))


def test_seq_trainer_token_table_actually_sharded():
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    mesh = create_mesh(data=4, model=2)
    vocab, n, l = 65536, 16, 8
    rng = np.random.default_rng(0)
    model = HSTUModel(vocab_size=vocab, d_model=16, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=l, dropout=0.0)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard_seq2", mesh=mesh, vocab_chunk_size=8192)
    loader = SeqLoader(rng.integers(1, vocab, (n, l)).astype(np.int32), np.zeros((n, l), np.int32), rng.integers(1, vocab, n).astype(np.int32), np.zeros((n, l), np.int32), batch_size=8)
    trainer._ensure_ready(loader)
    tok = trainer.state.params["token_embedding"]
    assert not tok.sharding.is_fully_replicated, "token table must row-shard over the model axis"


def _mtl_losses(mesh, method, steps=4):
    from torch_rechub_tpu.models.multi_task import MMOE
    from torch_rechub_tpu.trainers.mtl_trainer import MTLTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    rng = np.random.default_rng(11)
    n = 256
    x = {f"C{i}": rng.integers(0, 30, n).astype(np.int32) for i in range(4)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    ys = rng.integers(0, 2, (n, 2)).astype(np.float32)

    feats = tuple(SparseFeature(f"C{i}", vocab_size=30, embed_dim=6) for i in range(4)) + (DenseFeature("I0"),)
    model = MMOE(features=feats, task_types=("classification", "classification"), n_expert=3, expert_params={"dims": (16,), "dropout": 0.0}, tower_params_list=({"dims": (8,), "dropout": 0.0}, {"dims": (8,), "dropout": 0.0}))
    adaptive = {"method": method} if method else None
    trainer = MTLTrainer(model, ("classification", "classification"), adaptive_params=adaptive, n_epoch=1, model_path="/tmp/rechub_shard_mtl", mesh=mesh, seed=9)
    loader = ArrayLoader(x, ys, batch_size=64, shuffle=False)
    losses = trainer.train_one_epoch(loader, log_interval=0)
    extras = {}
    if trainer.state.loss_weight is not None:
        extras["loss_weight"] = np.asarray(jax.device_get(trainer.state.loss_weight))
    return losses, jax.device_get(trainer.state.params), extras


@pytest.mark.parametrize("method", [None, "uwl", "gradnorm", "metabalance"])
def test_mtl_adaptive_sharded_matches_unsharded(method):
    base_losses, base_params, base_extra = _mtl_losses(mesh=None, method=method)
    mesh = create_mesh(data=4, model=2)
    sh_losses, sh_params, sh_extra = _mtl_losses(mesh=mesh, method=method)
    np.testing.assert_allclose(base_losses, sh_losses, rtol=5e-4, atol=1e-5)
    if "loss_weight" in base_extra:
        np.testing.assert_allclose(base_extra["loss_weight"], sh_extra["loss_weight"], rtol=1e-3, atol=1e-4)
    # Dense biases feeding BatchNorm have mathematically zero gradient (BN is
    # shift-invariant), so Adam normalizes float noise to +-lr steps for those
    # degenerate leaves — exclude exactly them; everything else must match.
    def degenerate(path):
        keys = [getattr(k, "key", str(k)) for k in path]
        for i, k in enumerate(keys):
            if k.startswith("Dense_") and keys[-1] == "bias":
                parent = base_params
                for kk in keys[:i]:
                    parent = parent[kk]
                if f"BatchNorm_{k.split('_')[1]}" in parent:
                    return True
        return False

    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        if degenerate(p1):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=5e-4, err_msg=str(p1))


def _rqvae_run(mesh, epochs=2):
    from torch_rechub_tpu.models.generative.rqvae import RQVAEModel
    from torch_rechub_tpu.trainers.rqvae_trainer import RQVAETrainer

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(10, 32)) * 3
    data = (centers[rng.integers(0, 10, 256)] + rng.normal(size=(256, 32)) * 0.1).astype(np.float32)
    model = RQVAEModel(in_dim=32, num_emb_list=(16, 16), e_dim=8, layers=(16,), sk_epsilons=(0.0, 0.0), kmeans_init=True, kmeans_iters=2, dropout_prob=0.0)
    trainer = RQVAETrainer(model, n_epoch=epochs, eval_step=10, model_path="/tmp/rechub_shard_rqvae", mesh=mesh, seed=3)
    best_loss, _ = trainer.fit(data, batch_size=64)
    return best_loss, jax.device_get(trainer.state.params)


def test_rqvae_trainer_sharded_matches_unsharded():
    """DP-sharded RQ-VAE training (codebooks/MLPs replicated, batch over
    `data`) reproduces single-device numerics — the VQ argmin assignments
    must be identical per shard."""
    base_loss, base_params = _rqvae_run(mesh=None)
    mesh = create_mesh(data=8, model=1)
    sh_loss, sh_params = _rqvae_run(mesh=mesh)
    np.testing.assert_allclose(base_loss, sh_loss, rtol=1e-4)

    # Dense biases feeding BatchNorm are zero-gradient degenerate leaves
    # (see test_mtl_adaptive_sharded_matches_unsharded) — exclude exactly them
    def degenerate(path):
        keys = [getattr(k, "key", str(k)) for k in path]
        for i, k in enumerate(keys):
            if k.startswith("Dense_") and keys[-1] == "bias":
                parent = base_params
                for kk in keys[:i]:
                    parent = parent[kk]
                if f"BatchNorm_{k.split('_')[1]}" in parent:
                    return True
        return False

    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        if degenerate(p1):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=str(p1))


# ---------------------------------------------------------------------------
# round 5: sparse row-wise updates composed with a row-sharded table
# ---------------------------------------------------------------------------

def train_losses_sparse(mesh, n_steps=4):
    """CTRTrainer with sparse SGD updates on the FUSED table (force-fused so
    the tiny test vocab gets the production layout), optionally on a mesh."""
    from torch_rechub_tpu.ops.embedding import set_fused_default

    old = set_fused_default(True)
    try:
        x, y = data()
        model = build_model()
        trainer = CTRTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard_sparse", seed=7, mesh=mesh, sparse_embedding="sgd")
        loader = ArrayLoader(x, y, batch_size=64, shuffle=False)
        trainer._ensure_ready(loader)
        losses = []
        for i, (xb, yb) in enumerate(loader):
            if i >= n_steps:
                break
            xb = trainer.place_batch({k: jnp.asarray(v) for k, v in xb.items()})
            rng = jax.random.PRNGKey(0)
            trainer.state, loss = trainer._train_step(trainer.state, xb, jnp.asarray(yb), jnp.ones(64, jnp.float32), jnp.asarray(1e-3), rng)
            losses.append(float(loss))
        return losses, jax.device_get(trainer.state.params)
    finally:
        set_fused_default(old)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sparse_updates_compose_with_rowsharded_table(mesh_shape):
    """The production combination: row-wise scatter updates INTO a table
    row-sharded over `model` + DP batch over `data` — sharded == unsharded
    losses and parameters (XLA lowers the scatter-add on the sharded operand)."""
    base_losses, base_params = train_losses_sparse(mesh=None)
    mesh = create_mesh(data=mesh_shape[0], model=mesh_shape[1])
    sh_losses, sh_params = train_losses_sparse(mesh=mesh)
    np.testing.assert_allclose(base_losses, sh_losses, rtol=2e-4, atol=1e-5)
    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2.5e-3, err_msg=str(p1))


def _seq_sampled_sparse_losses(mesh, vocab=65536, n=32, l=8):
    """The round-5 production recipe under SPMD: sampled softmax + sparse
    row-wise updates of BOTH vocab tables, token/output tables row-sharded
    over `model` when a mesh is given."""
    from torch_rechub_tpu.models.generative import HSTUModel
    from torch_rechub_tpu.trainers.seq_trainer import SeqTrainer
    from torch_rechub_tpu.utils.data import SeqLoader

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, vocab, (n, l)).astype(np.int32)
    positions = np.broadcast_to(np.arange(l, dtype=np.int32), (n, l)).copy()
    tds = np.sort(rng.integers(0, 10**5, (n, l)), axis=1).astype(np.int32)
    targets = rng.integers(1, vocab, n).astype(np.int32)

    model = HSTUModel(vocab_size=vocab, d_model=16, n_heads=2, n_layers=1, dqk=8, dv=8, max_seq_len=l, dropout=0.0, tie_embeddings=False)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_shard_seq_sp", mesh=mesh, seed=5, loss_type="sampled_softmax", loss_params={"num_negatives": 64}, sparse_embedding="sgd", steps_per_call=1)
    loader = SeqLoader(tokens, positions, targets, tds, batch_size=8, shuffle=False)
    loss = trainer.train_one_epoch(loader, log_interval=0)
    if mesh is not None:
        for name in ("token_embedding", "output_projection"):
            assert not trainer.state.params[name].sharding.is_fully_replicated, f"{name} must row-shard"
    return loss, jax.device_get(trainer.state.params)


def test_seq_sampled_sparse_sharded_matches_unsharded():
    """Sampled softmax + sparse in/out tables: scatter updates into
    row-sharded tables + DP batch produce identical results to unsharded."""
    base_loss, base_params = _seq_sampled_sparse_losses(mesh=None)
    mesh = create_mesh(data=4, model=2)
    sh_loss, sh_params = _seq_sampled_sparse_losses(mesh=mesh)
    np.testing.assert_allclose(base_loss, sh_loss, rtol=3e-4)
    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(base_params)[0], jax.tree_util.tree_flatten_with_path(sh_params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-4, err_msg=str(p1))
