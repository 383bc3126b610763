"""Fused embedding storage: layout, numerics parity with unfused, grads, sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_rechub_tpu.basic.features import DenseFeature, SequenceFeature, SparseFeature
from torch_rechub_tpu.ops.embedding import _FUSED_ROW_MULTIPLE, EmbeddingCollection

FEATS = (
    SparseFeature("cat", 50, embed_dim=8),
    SparseFeature("cat_shared", 50, embed_dim=8, shared_with="cat"),
    SparseFeature("brand", 30, embed_dim=8),
    SequenceFeature("hist", 50, embed_dim=8, pooling="mean", shared_with="cat", padding_idx=0),
    SparseFeature("wide", 20, embed_dim=4),  # second dim-group
    DenseFeature("price"),
)

# __call__ takes a uniform-dim feature list (same contract as the reference
# EmbeddingLayer); the d4 feature exercises multi-group *storage* only.
CALL_FEATS = tuple(f for f in FEATS if getattr(f, "embed_dim", None) == 8) + (DenseFeature("price"),)


def batch(n=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "cat": jnp.asarray(rng.integers(0, 50, n)),
        "cat_shared": jnp.asarray(rng.integers(0, 50, n)),
        "brand": jnp.asarray(rng.integers(0, 30, n)),
        "hist": jnp.asarray(rng.integers(0, 50, (n, 7))),
        "wide": jnp.asarray(rng.integers(0, 20, n)),
        "price": jnp.asarray(rng.normal(size=n).astype(np.float32)),
    }


def test_fused_param_layout():
    coll = EmbeddingCollection(features=FEATS, fused=True)
    x = batch()
    variables = coll.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    names = sorted(variables["params"].keys())
    assert names == ["fused_d4_table", "fused_d8_table"]
    d8 = variables["params"]["fused_d8_table"]
    # cat(50) + brand(30) = 80 rows padded to the NEXT row multiple (>=1 spare)
    assert d8.shape == ((80 // _FUSED_ROW_MULTIPLE + 1) * _FUSED_ROW_MULTIPLE, 8)
    assert d8.shape[0] % _FUSED_ROW_MULTIPLE == 0
    # padded tail rows are zero
    np.testing.assert_allclose(np.asarray(d8[80:]), 0.0)


def test_fused_matches_unfused_given_same_tables():
    """With identical table values, fused and unfused outputs are identical."""
    x = batch()
    unfused = EmbeddingCollection(features=FEATS, fused=False)
    uvars = unfused.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    fused = EmbeddingCollection(features=FEATS, fused=True)
    fvars = fused.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    # copy unfused tables into the fused storage (layout: insertion order)
    d8 = np.array(fvars["params"]["fused_d8_table"])
    d8[0:50] = np.asarray(uvars["params"]["cat_table"])
    d8[50:80] = np.asarray(uvars["params"]["brand_table"])
    d4 = np.array(fvars["params"]["fused_d4_table"])
    d4[0:20] = np.asarray(uvars["params"]["wide_table"])
    fparams = {"fused_d8_table": jnp.asarray(d8), "fused_d4_table": jnp.asarray(d4)}

    for squeeze in (False, True):
        feats = CALL_FEATS if squeeze else tuple(f for f in CALL_FEATS if not isinstance(f, DenseFeature))
        a = unfused.apply(uvars, x, feats, squeeze_dim=squeeze)
        b = fused.apply({"params": fparams}, x, feats, squeeze_dim=squeeze)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_fused_padding_row_gradient_zero():
    feats = (SequenceFeature("hist", 10, embed_dim=4, pooling="sum", padding_idx=0),)
    coll = EmbeddingCollection(features=feats, fused=True)
    x = {"hist": jnp.array([[1, 0, 0]])}
    variables = coll.init(jax.random.PRNGKey(0), x, feats)
    table = variables["params"]["fused_d4_table"]
    np.testing.assert_allclose(np.asarray(table[0]), 0.0)

    def loss(params):
        return jnp.sum(coll.apply({"params": params}, x, feats) ** 2)

    grads = jax.grad(loss)(variables["params"])["fused_d4_table"]
    np.testing.assert_allclose(np.asarray(grads[0]), 0.0)  # padding row
    assert np.abs(np.asarray(grads[1])).sum() > 0
    np.testing.assert_allclose(np.asarray(grads[10:]), 0.0)  # padded tail rows


def test_fused_shared_with_same_rows():
    coll = EmbeddingCollection(features=FEATS, fused=True)
    x = batch()
    variables = coll.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    x2 = dict(x)
    x2["cat_shared"] = x["cat"]
    out = coll.apply(variables, x2, FEATS[:2])
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def test_fused_table_slice_api():
    coll = EmbeddingCollection(features=FEATS, fused=True)
    x = batch()
    variables = coll.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)

    def get_table(v):
        return coll.apply(v, "brand", method=coll.table)

    t = get_table(variables)
    assert t.shape == (30, 8)
    np.testing.assert_allclose(np.asarray(t), np.asarray(variables["params"]["fused_d8_table"][50:80]))


def test_fused_table_row_shards_on_mesh():
    """The padded fused table row-shards over the model axis (old layout kept
    indivisible vocabs replicated)."""
    from torch_rechub_tpu.parallel.mesh import create_mesh, param_shardings

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(data=4, model=2)
    coll = EmbeddingCollection(features=FEATS, fused=True)
    x = batch()
    variables = coll.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    shardings = param_shardings(variables["params"], mesh)
    spec = shardings["fused_d8_table"].spec
    assert spec[0] == "model"


def test_auto_layout_mixes_fused_and_per_feature():
    """'auto' (the default): >=262144-row tables fuse, small ones stay
    per-feature params; numerics identical to the per-feature layout."""
    from torch_rechub_tpu.ops.embedding import _FUSED_AUTO_MIN_ROWS, _FUSED_DEFAULT

    assert _FUSED_DEFAULT[0] == "auto"
    big_v = _FUSED_AUTO_MIN_ROWS
    feats = (SparseFeature("big", big_v, embed_dim=8), SparseFeature("tiny", 40, embed_dim=8))
    rng = np.random.default_rng(1)
    x = {
        "big": jnp.asarray(rng.integers(0, big_v, 6)),
        "tiny": jnp.asarray(rng.integers(0, 40, 6)),
    }
    auto = EmbeddingCollection(features=feats)  # default == "auto"
    avars = auto.init(jax.random.PRNGKey(0), x, feats)
    assert sorted(avars["params"].keys()) == ["fused_d8_table", "tiny_table"]

    unfused = EmbeddingCollection(features=feats, fused=False)
    uvars = unfused.init(jax.random.PRNGKey(0), x, feats)
    fused_big = np.array(avars["params"]["fused_d8_table"])
    fused_big[:big_v] = np.asarray(uvars["params"]["big_table"])
    aparams = {"fused_d8_table": jnp.asarray(fused_big), "tiny_table": uvars["params"]["tiny_table"]}

    a = auto.apply({"params": aparams}, x, feats)
    b = unfused.apply(uvars, x, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_invalid_fused_value_rejected():
    import pytest

    coll = EmbeddingCollection(features=FEATS, fused="Auto")  # typo'd string
    with pytest.raises(ValueError, match="fused must be"):
        coll.init(jax.random.PRNGKey(0), batch(), CALL_FEATS, squeeze_dim=True)


def test_checkpoint_layout_mismatch_raises_migration_hint(tmp_path):
    """A fused-layout checkpoint must fail with the set_fused_default hint
    when loaded into a per-feature model (and vice versa)."""
    import pytest

    from torch_rechub_tpu.trainers.base import load_checkpoint, save_checkpoint

    x = batch()
    fused = EmbeddingCollection(features=FEATS, fused=True)
    fvars = fused.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    save_checkpoint(str(tmp_path), {"params": fvars["params"]})

    unfused = EmbeddingCollection(features=FEATS, fused=False)
    uvars = unfused.init(jax.random.PRNGKey(0), x, CALL_FEATS, squeeze_dim=True)
    with pytest.raises(ValueError, match="set_fused_default"):
        load_checkpoint(str(tmp_path), {"params": uvars["params"]})

    # reverse direction
    save_checkpoint(str(tmp_path), {"params": uvars["params"]}, name="u.msgpack")
    with pytest.raises(ValueError, match="set_fused_default"):
        load_checkpoint(str(tmp_path), {"params": fvars["params"]}, name="u.msgpack")
