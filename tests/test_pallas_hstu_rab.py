"""On-the-fly rab HSTU kernel: pallas (interpret) == dense XLA, fwd + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_rechub_tpu.ops.pallas import hstu_rab_attention as mod
from torch_rechub_tpu.ops.pallas.hstu_rab_attention import BucketCfg, _dense_forward, hstu_attention_rab

B, H, L, DQK, DV = 2, 3, 256, 32, 32
MAXL = 256
CFG = BucketCfg(num_buckets=16, fn="sqrt", divisor=1.0, unit="minutes")


def inputs(seed=0, has_time=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, L, DQK)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, H, L, DQK)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, H, L, DV)).astype(np.float32)) * 0.3
    pos_w = jnp.asarray(rng.normal(size=(2 * MAXL - 1, H)).astype(np.float32)) * 0.1
    ts_w = jnp.asarray(rng.normal(size=(CFG.num_buckets + 1, H)).astype(np.float32)) * 0.1
    # near-sorted timestamps (seconds), some repeats
    ts = jnp.asarray(np.sort(rng.integers(0, 3_000_000, (B, L)), axis=1).astype(np.int32)) if has_time else None
    mask = jnp.asarray(np.concatenate([np.ones((B, L - 17)), np.zeros((B, 17))], axis=1).astype(bool))
    return q, k, v, pos_w, ts_w, ts, mask


@pytest.fixture
def force_interpret():
    mod._FORCE_INTERPRET[0] = True
    yield
    mod._FORCE_INTERPRET[0] = False


@pytest.mark.parametrize("has_time", [False, True])
def test_forward_matches_dense(force_interpret, has_time):
    q, k, v, pos_w, ts_w, ts, mask = inputs(has_time=has_time)
    out = hstu_attention_rab(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, 128, 128)
    ref = _dense_forward(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, has_time)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("has_time", [False, True])
def test_grads_match_dense(force_interpret, has_time):
    q, k, v, pos_w, ts_w, ts, mask = inputs(seed=1, has_time=has_time)
    g_target = jnp.asarray(np.random.default_rng(2).normal(size=(B, H, L, DV)).astype(np.float32))

    def loss_pallas(q, k, v, pos_w, ts_w):
        out = hstu_attention_rab(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, 128, 128)
        return jnp.sum(out * g_target)

    def loss_dense(q, k, v, pos_w, ts_w):
        out = _dense_forward(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, has_time)
        return jnp.sum(out * g_target)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    names = ["dq", "dk", "dv", "dpos_w", "dts_w"]
    for name, a, b in zip(names, gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name)


def test_skew_diag_sums_matches_naive():
    rng = np.random.default_rng(3)
    bq, l, maxl = 8, 32, 32
    ds = rng.normal(size=(2, 3, bq, l)).astype(np.float32)
    q0 = 16
    got = np.asarray(mod._skew_diag_sums(jnp.asarray(ds), q0, l, maxl))
    n_pos = 2 * maxl - 1
    exp = np.zeros((n_pos, 3), np.float32)
    for b in range(2):
        for h in range(3):
            for i in range(bq):
                for m in range(l):
                    exp[m - (q0 + i) + maxl - 1, h] += ds[b, h, i, m]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_hstu_layer_uses_rab_kernel(force_interpret):
    """HSTULayer fused path == einsum path, with timestamps."""
    from torch_rechub_tpu.basic.hstu import HSTULayer

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 256, 32)).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.integers(0, 10**6, (2, 256)), axis=1).astype(np.int32))
    mask = jnp.asarray(np.concatenate([np.ones((2, 200)), np.zeros((2, 56))], axis=1).astype(bool))

    kw = dict(d_model=32, n_heads=2, dqk=16, dv=16, dropout=0.0, max_seq_len=256, num_time_buckets=16)
    fused = HSTULayer(use_fused_kernel=True, **kw)
    plain = HSTULayer(use_fused_kernel=False, **kw)
    variables = fused.init(jax.random.PRNGKey(0), x, padding_mask=mask, time_diffs=ts)
    out_f = fused.apply(variables, x, padding_mask=mask, time_diffs=ts)
    out_p = plain.apply(variables, x, padding_mask=mask, time_diffs=ts)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), rtol=2e-4, atol=2e-5)


def test_rab_kernel_composes_with_mesh_shard_map(force_interpret):
    """The kernel runs per-shard under shard_map with the batch sharded over
    `data` on the virtual CPU mesh — sharded == unsharded outputs.  Pins the
    kernel's SPMD compatibility (batch-dim sharding) instead of assuming it."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    b = 4
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(b, H, L, DQK)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, H, L, DQK)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, H, L, DV)).astype(np.float32)) * 0.3
    pos_w = jnp.asarray(rng.normal(size=(2 * MAXL - 1, H)).astype(np.float32)) * 0.1
    ts_w = jnp.asarray(rng.normal(size=(CFG.num_buckets + 1, H)).astype(np.float32)) * 0.1
    ts = jnp.asarray(np.sort(rng.integers(0, 3_000_000, (b, L)), axis=1).astype(np.int32))
    mask = jnp.asarray(np.concatenate([np.ones((b, L - 9)), np.zeros((b, 9))], axis=1).astype(bool))

    def attn(q, k, v, ts, mask):
        return hstu_attention_rab(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, 128, 128)

    ref = attn(q, k, v, ts, mask)
    sharded_fn = shard_map(attn, mesh=mesh, in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")), out_specs=P("data"), check_vma=False)
    out = jax.jit(sharded_fn)(q, k, v, ts, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # and the backward per-shard: grads of a scalar loss match unsharded
    def loss_sharded(q, k, v):
        return jnp.sum(jax.jit(sharded_fn)(q, k, v, ts, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn(q, k, v, ts, mask) ** 2)

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-5)


def test_bucket_thresholds_exact_at_edges():
    """thr[u] reproduces the f32 bucketize edges EXACTLY for every cfg:
    (|dt| >= thr[u]) <=> (bucketize(dt) >= u), checked at random dts AND the
    +-1 neighborhood of every boundary (sqrt and log, several divisors/units)."""
    from torch_rechub_tpu.ops.pallas.hstu_rab_attention import compute_bucket_thresholds

    imax = np.iinfo(np.int32).max
    rng = np.random.default_rng(5)
    cfgs = [
        BucketCfg(16, "sqrt", 1.0, "minutes"),
        BucketCfg(128, "sqrt", 1.0, "minutes"),
        BucketCfg(64, "sqrt", 2.0, "seconds"),
        BucketCfg(32, "log", 0.5, "seconds"),
        BucketCfg(128, "log", 1.0, "minutes"),
    ]
    for cfg in cfgs:
        thr = np.asarray(compute_bucket_thresholds(cfg)).astype(np.int64)
        nb = cfg.num_buckets
        assert thr.shape == (nb + 1,)
        assert thr[0] == 0
        assert np.all(np.diff(thr) >= 0), cfg
        reach = thr < imax
        # bucketize at thr reaches u for every reachable boundary
        us = np.arange(nb + 1)
        at = np.asarray(mod._bucketize(jnp.asarray(thr[reach].astype(np.int32)), cfg))
        assert np.all(at >= us[reach]), cfg
        # dense equivalence sweep incl. every boundary's +-1 neighborhood
        edges = thr[reach]
        dts = np.unique(np.concatenate([
            rng.integers(0, imax, 4096),
            edges, np.maximum(edges - 1, 0), np.minimum(edges + 1, imax - 1),
        ])).astype(np.int32)
        b = np.asarray(mod._bucketize(jnp.asarray(dts), cfg))  # (N,)
        ge_thr = dts.astype(np.int64)[:, None] >= thr[None, :]  # (N, nb+1)
        ge_bucket = b[:, None] >= us[None, :]
        if cfg.fn == "sqrt":
            # sqrt/div are correctly rounded (IEEE) => bucketize is monotone
            # and the kernel's threshold compare is EXACTLY the dense select,
            # including minimality (bucketize(thr-1) < u)
            prev_ok = reach & (thr > 0)
            below = np.asarray(mod._bucketize(jnp.asarray((thr[prev_ok] - 1).astype(np.int32)), cfg))
            assert np.all(below < us[prev_ok]), cfg
            np.testing.assert_array_equal(ge_thr, ge_bucket, err_msg=str(cfg))
        else:
            # XLA's log approximation is not ULP-monotone: disagreements may
            # exist, but ONLY at ints in the wobble band just below a
            # boundary (|dt - thr[u]| < 64), and the threshold side must be
            # the monotone regularization (disagreement => dense bucketize
            # dipped below its running max)
            mismatch = ge_thr != ge_bucket
            rows, cols = np.nonzero(mismatch)
            if rows.size:
                dist = np.abs(dts[rows].astype(np.int64) - thr[cols])
                assert np.all(dist < 64), (cfg, dist.max())
                assert rows.size < dts.size, cfg  # isolated points, not regions


@pytest.mark.parametrize("case", ["shuffled_ts", "scattered_mask", "empty_row"])
def test_adversarial_inputs_match_dense(force_interpret, case):
    """Correctness must not depend on timestamp sortedness or mask shape:
    fully shuffled timestamps (worst-case bucket ranges), a scattered
    (non-suffix) padding mask, and an entirely masked-out row."""
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(B, H, L, DQK)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, H, L, DQK)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, H, L, DV)).astype(np.float32)) * 0.3
    pos_w = jnp.asarray(rng.normal(size=(2 * MAXL - 1, H)).astype(np.float32)) * 0.1
    ts_w = jnp.asarray(rng.normal(size=(CFG.num_buckets + 1, H)).astype(np.float32)) * 0.1
    ts = jnp.asarray(rng.integers(0, 3_000_000, (B, L)).astype(np.int32))  # NOT sorted
    if case == "shuffled_ts":
        mask = jnp.asarray(np.ones((B, L), bool))
    elif case == "scattered_mask":
        mask = jnp.asarray(rng.uniform(size=(B, L)) > 0.3)
    else:
        m = np.ones((B, L), bool)
        m[0, :] = False  # entire row masked out
        mask = jnp.asarray(m)

    g_target = jnp.asarray(rng.normal(size=(B, H, L, DV)).astype(np.float32))

    def loss_pallas(q, k, v, pos_w, ts_w):
        out = hstu_attention_rab(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, 128, 128)
        return jnp.sum(out * g_target)

    def loss_dense(q, k, v, pos_w, ts_w):
        out = _dense_forward(q, k, v, pos_w, ts_w, ts, mask, 0.125, MAXL, CFG, True)
        return jnp.sum(out * g_target)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    for name, a, b in zip(["dq", "dk", "dv", "dpos_w", "dts_w"], gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=f"{case}:{name}")
