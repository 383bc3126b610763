"""Preemption-safe checkpoint tests: full-state save/restore + mid-training resume."""

import jax
import numpy as np

from torch_rechub_tpu.basic.features import DenseFeature, SparseFeature
from torch_rechub_tpu.models.ranking import DeepFM
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.checkpoint import TrainCheckpointer
from torch_rechub_tpu.utils.data import ArrayLoader


def make(n=256):
    rng = np.random.default_rng(0)
    x = {f"C{i}": rng.integers(0, 30, n).astype(np.int32) for i in range(3)}
    x["I0"] = rng.normal(size=n).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.float32)
    sparse = tuple(SparseFeature(f"C{i}", vocab_size=30, embed_dim=4) for i in range(3))
    model = DeepFM(deep_features=(DenseFeature("I0"),), fm_features=sparse, mlp_params={"dims": (8,), "dropout": 0.0})
    return model, x, y


def test_full_state_roundtrip(tmp_path):
    model, x, y = make()
    trainer = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3)
    loader = ArrayLoader(x, y, batch_size=64)
    trainer._ensure_ready(loader)
    trainer.train_one_epoch(loader)
    ckpt = TrainCheckpointer(str(tmp_path / "ckpts"), max_to_keep=2)
    step = int(trainer.state.step)
    ckpt.save(step, trainer.state)
    assert ckpt.latest_step() == step
    restored, rstep = ckpt.restore(jax.device_get(trainer.state))
    assert rstep == step
    # opt_state restored too (not just params)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trainer.state)), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_continues_exactly(tmp_path):
    """Train 8 steps straight == train 4, checkpoint, resume, train 4 more."""
    model, x, y = make()

    def steps(trainer, loader, n):
        import jax.numpy as jnp

        from torch_rechub_tpu.utils.data import pad_batch

        it = iter(loader)
        for i in range(n):
            try:
                xb, yb = next(it)
            except StopIteration:
                it = iter(loader)
                xb, yb = next(it)
            xb, yb, w = pad_batch(xb, yb, loader.batch_size)
            rng = jax.random.fold_in(jax.random.PRNGKey(99), int(trainer.state.step))
            trainer.state, _ = trainer._train_step(trainer.state, {k: jnp.asarray(v) for k, v in xb.items()}, jnp.asarray(yb, jnp.float32), jnp.asarray(w), jnp.asarray(1e-3, jnp.float32), rng)

    loader = ArrayLoader(x, y, batch_size=64)
    t1 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3)
    t1._ensure_ready(loader)
    steps(t1, loader, 8)
    final_straight = jax.device_get(t1.state.params)

    t2 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3)
    t2._ensure_ready(loader)
    ckpt = t2.enable_step_checkpointing(str(tmp_path / "resume_ckpts"), every_n_steps=4)
    steps(t2, loader, 4)
    ckpt.save(int(t2.state.step), t2.state)

    t3 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3)
    t3._ensure_ready(loader)
    t3.enable_step_checkpointing(str(tmp_path / "resume_ckpts"), every_n_steps=4)
    resumed = t3.maybe_resume()
    assert resumed == 4
    steps(t3, loader, 4)
    final_resumed = jax.device_get(t3.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(final_straight), jax.tree_util.tree_leaves(final_resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_load_checkpoint_row_padding_diagnostic(tmp_path):
    """A checkpoint saved before table row-padding raises a targeted error."""
    import flax.serialization
    import pytest

    from torch_rechub_tpu.trainers.base import load_checkpoint

    old = {"params": {"emb": {"user_table": np.zeros((150000, 8), np.float32)}}}
    target = tmp_path / "model.msgpack"
    target.write_bytes(flax.serialization.to_bytes(old))
    template = {"params": {"emb": {"user_table": np.zeros((150016, 8), np.float32)}}}
    with pytest.raises(ValueError, match="ROW counts"):
        load_checkpoint(str(tmp_path), template)


def test_resume_continues_exactly_sparse(tmp_path):
    """Exact resume with the SPARSE opt_state structure — (dense optax state,
    row-wise accumulators) — through TrainCheckpointer (round-5 coverage)."""
    from torch_rechub_tpu.ops.embedding import set_fused_default

    old = set_fused_default(True)
    try:
        model, x, y = make()

        def steps(trainer, loader, n):
            import jax.numpy as jnp

            from torch_rechub_tpu.utils.data import pad_batch

            it = iter(loader)
            for i in range(n):
                try:
                    xb, yb = next(it)
                except StopIteration:
                    it = iter(loader)
                    xb, yb = next(it)
                xb, yb, w = pad_batch(xb, yb, loader.batch_size)
                rng = jax.random.fold_in(jax.random.PRNGKey(99), int(trainer.state.step))
                trainer.state, _ = trainer._train_step(trainer.state, {k: jnp.asarray(v) for k, v in xb.items()}, jnp.asarray(yb, jnp.float32), jnp.asarray(w), jnp.asarray(1e-3, jnp.float32), rng)

        loader = ArrayLoader(x, y, batch_size=64)
        t1 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3, sparse_embedding="adagrad")
        t1._ensure_ready(loader)
        steps(t1, loader, 8)
        final_straight = jax.device_get(t1.state)

        t2 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3, sparse_embedding="adagrad")
        t2._ensure_ready(loader)
        ckpt = t2.enable_step_checkpointing(str(tmp_path / "sparse_ckpts"), every_n_steps=4)
        steps(t2, loader, 4)
        ckpt.save(int(t2.state.step), t2.state)

        t3 = CTRTrainer(model, n_epoch=1, model_path=str(tmp_path), seed=3, sparse_embedding="adagrad")
        t3._ensure_ready(loader)
        t3.enable_step_checkpointing(str(tmp_path / "sparse_ckpts"), every_n_steps=4)
        assert t3.maybe_resume() == 4
        steps(t3, loader, 4)
        final_resumed = jax.device_get(t3.state)
        # params AND the adagrad accumulators must match the straight run
        for a, b in zip(jax.tree_util.tree_leaves(final_straight), jax.tree_util.tree_leaves(final_resumed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    finally:
        set_fused_default(old)
