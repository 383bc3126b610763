"""Budget-aware table placement policy (parallel.mesh.plan_table_placement)."""

import warnings

import jax
import numpy as np
import pytest

from torch_rechub_tpu.parallel import mesh as mesh_lib
from torch_rechub_tpu.parallel.mesh import SHARD_MIN_ROWS, plan_table_placement


def test_single_model_axis_replicates_everything():
    plan = plan_table_placement({"a": (10_000_000, 64)}, n_model=1)
    assert plan == {"a": "replicate"}


def test_large_divisible_table_shards():
    plan = plan_table_placement({"a": (1 << 20, 16), "b": (100, 16)}, n_model=4)
    assert plan["a"] == "shard"
    assert plan["b"] == "replicate"


def test_150k_table_shards_at_model_4():
    """The VERDICT acceptance case: 150k rows (padded to 64-multiple by
    EmbeddingCollection) shards at model=4 — above SHARD_MIN_ROWS, divisible."""
    rows = -(-150_000 // 64) * 64
    plan = plan_table_placement({"t": (rows, 16)}, n_model=4)
    assert plan["t"] == "shard"


def test_indivisible_large_table_warns_and_replicates():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = plan_table_placement({"odd": (SHARD_MIN_ROWS + 1, 16)}, n_model=4)
    assert plan["odd"] == "replicate"
    assert any("stays replicated" in str(x.message) for x in w)


def test_budget_forces_sharding_below_threshold():
    """Tables below SHARD_MIN_ROWS shard largest-first when the replicated
    total exceeds the budget."""
    # 3 tables of 32k x 128 f32 = 16 MiB each; budget 40 MiB → shard ONE
    # (each model=2 shard saves 8 MiB; 48 - 8 = 40 fits)
    shapes = {f"t{i}": (32_768, 128) for i in range(3)}
    plan = plan_table_placement(shapes, n_model=2, hbm_budget_bytes=40 << 20)
    assert sorted(plan.values()) == ["replicate", "replicate", "shard"]
    # generous budget → all replicate
    plan2 = plan_table_placement(shapes, n_model=2, hbm_budget_bytes=1 << 30)
    assert set(plan2.values()) == {"replicate"}


def test_param_shardings_uses_policy_on_padded_per_feature_table():
    """A 150k-vocab per-feature table (auto layout keeps it per-feature,
    padded to 64-multiple) actually row-shards over model=4."""
    import jax.numpy as jnp

    from torch_rechub_tpu.basic.features import SparseFeature
    from torch_rechub_tpu.ops.embedding import EmbeddingCollection

    fea = (SparseFeature("big", 150_000, embed_dim=8), SparseFeature("small", 50, embed_dim=8))
    coll = EmbeddingCollection(features=fea, fused="auto")
    x = {"big": np.zeros(4, np.int32), "small": np.zeros(4, np.int32)}
    v = coll.init(jax.random.PRNGKey(0), x, fea, squeeze_dim=True)
    assert v["params"]["big_table"].shape[0] % 64 == 0
    assert v["params"]["big_table"].shape[0] >= 150_000

    mesh = mesh_lib.create_mesh(data=2, model=4)
    sh = mesh_lib.param_shardings(v["params"], mesh)
    assert sh["big_table"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["small_table"].spec == jax.sharding.PartitionSpec()

    # lookup through sharded params still returns vocab-exact rows
    params = jax.tree_util.tree_map(jax.device_put, dict(v["params"]), dict(sh))
    out = jax.jit(lambda p, x: coll.apply({"params": p}, x, fea, squeeze_dim=True))(params, x)
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(coll.apply(v, x, fea, squeeze_dim=True)), rtol=1e-6)
