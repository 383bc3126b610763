"""Numeric parity vs the reference torch implementation (same weights).

These tests build the reference layer (torch, CPU) and ours (flax), copy the
torch weights into the flax params, and assert outputs match to float32
tolerance.  They are the strongest form of capability parity — identical
math, not just matching shapes.  Skipped when the reference checkout is not
mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, "torch_rechub")), reason="reference checkout not available")

if os.path.isdir(os.path.join(REFERENCE, "torch_rechub")):
    sys.path.insert(0, "/tmp/fake_meta")
    sys.path.insert(0, REFERENCE)
    os.makedirs("/tmp/fake_meta/torch_rechub-0.0.3.dist-info", exist_ok=True)
    meta = "/tmp/fake_meta/torch_rechub-0.0.3.dist-info/METADATA"
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            f.write("Metadata-Version: 2.1\nName: torch-rechub\nVersion: 0.0.3\n")

import jax
import jax.numpy as jnp

B, F, D = 4, 6, 8
RTOL, ATOL = 1e-5, 1e-5


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def t(x):
    import torch

    return torch.from_numpy(np.asarray(x))


def test_fm_parity():
    import torch

    from torch_rechub.basic.layers import FM as TorchFM

    from torch_rechub_tpu.basic.layers import FM

    x = rnd(B, F, D)
    with torch.no_grad():
        expected = TorchFM(reduce_sum=True)(t(x)).numpy()
    ours = FM(reduce_sum=True)
    out = np.asarray(ours.apply(ours.init(jax.random.PRNGKey(0), x), x))
    np.testing.assert_allclose(out, expected, rtol=RTOL, atol=ATOL)


def test_crossnetwork_parity():
    import torch

    from torch_rechub.basic.layers import CrossNetwork as TorchCN

    from torch_rechub_tpu.basic.layers import CrossNetwork

    x = rnd(B, D)
    torch_cn = TorchCN(D, num_layers=2)
    ours = CrossNetwork(num_layers=2)
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    for i in range(2):
        params[f"w_{i}"]["kernel"] = jnp.asarray(torch_cn.w[i].weight.detach().numpy().T)
        params[f"b_{i}"] = jnp.asarray(torch_cn.b[i].detach().numpy())
    with torch.no_grad():
        expected = torch_cn(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, x))
    np.testing.assert_allclose(out, expected, rtol=RTOL, atol=ATOL)


def test_crossnet_v2_parity():
    import torch

    from torch_rechub.basic.layers import CrossNetV2 as TorchCN2

    from torch_rechub_tpu.basic.layers import CrossNetV2

    x = rnd(B, D)
    torch_cn = TorchCN2(D, num_layers=3)
    ours = CrossNetV2(num_layers=3)
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    for i in range(3):
        params[f"w_{i}"]["kernel"] = jnp.asarray(torch_cn.w[i].weight.detach().numpy().T)
        params[f"b_{i}"] = jnp.asarray(torch_cn.b[i].detach().numpy())
    with torch.no_grad():
        expected = torch_cn(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, x))
    np.testing.assert_allclose(out, expected, rtol=RTOL, atol=ATOL)


def test_cin_parity():
    import torch

    from torch_rechub.basic.layers import CIN as TorchCIN

    from torch_rechub_tpu.basic.layers import CIN

    x = rnd(B, F, D)
    torch_cin = TorchCIN(F, cin_size=[8, 6], split_half=True)
    ours = CIN(input_dim=F, cin_size=(8, 6), split_half=True)
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    for i, conv in enumerate(torch_cin.conv_layers):
        params[f"conv_w_{i}"] = jnp.asarray(conv.weight.detach().numpy()[:, :, 0])
        params[f"conv_b_{i}"] = jnp.asarray(conv.bias.detach().numpy())
    params["Dense_0"]["kernel"] = jnp.asarray(torch_cin.fc.weight.detach().numpy().T)
    params["Dense_0"]["bias"] = jnp.asarray(torch_cin.fc.bias.detach().numpy())
    with torch.no_grad():
        expected = torch_cin(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, x))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_senet_parity():
    import torch

    from torch_rechub.basic.layers import SENETLayer as TorchSE

    from torch_rechub_tpu.basic.layers import SENETLayer

    x = rnd(B, F, D)
    torch_se = TorchSE(F, reduction_ratio=3)
    ours = SENETLayer(num_fields=F, reduction_ratio=3)
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    params["Dense_0"]["kernel"] = jnp.asarray(torch_se.mlp[0].weight.detach().numpy().T)
    params["Dense_1"]["kernel"] = jnp.asarray(torch_se.mlp[2].weight.detach().numpy().T)
    with torch.no_grad():
        expected = torch_se(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, x))
    np.testing.assert_allclose(out, expected, rtol=RTOL, atol=ATOL)


def test_interacting_layer_parity():
    import torch

    from torch_rechub.basic.layers import InteractingLayer as TorchIL

    from torch_rechub_tpu.basic.layers import InteractingLayer

    x = rnd(B, F, D)
    torch_il = TorchIL(D, num_heads=2, dropout=0.0, residual=True)
    torch_il.eval()
    ours = InteractingLayer(embed_dim=D, num_heads=2, dropout=0.0, residual=True)
    params = ours.init(jax.random.PRNGKey(0), x)["params"]
    for name in ("W_Q", "W_K", "W_V", "W_Res"):
        params[name]["kernel"] = jnp.asarray(getattr(torch_il, name).weight.detach().numpy().T)
    with torch.no_grad():
        expected = torch_il(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, x, training=False))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_mlp_parity_eval_mode():
    import torch

    from torch_rechub.basic.layers import MLP as TorchMLP

    from torch_rechub_tpu.basic.layers import MLP

    x = rnd(B, 16)
    torch_mlp = TorchMLP(16, output_layer=True, dims=[12, 8], dropout=0.0, activation="relu")
    torch_mlp.eval()
    ours = MLP(dims=(12, 8), output_layer=True, dropout=0.0, activation="relu")
    variables = ours.init(jax.random.PRNGKey(0), x, training=False)
    params, bstats = variables["params"], variables["batch_stats"]
    linears = [m for m in torch_mlp.mlp if isinstance(m, torch.nn.Linear)]
    bns = [m for m in torch_mlp.mlp if isinstance(m, torch.nn.BatchNorm1d)]
    for i, lin in enumerate(linears):
        params[f"Dense_{i}"]["kernel"] = jnp.asarray(lin.weight.detach().numpy().T)
        params[f"Dense_{i}"]["bias"] = jnp.asarray(lin.bias.detach().numpy())
    for i, bn in enumerate(bns):
        params[f"BatchNorm_{i}"]["scale"] = jnp.asarray(bn.weight.detach().numpy())
        params[f"BatchNorm_{i}"]["bias"] = jnp.asarray(bn.bias.detach().numpy())
        bstats[f"BatchNorm_{i}"]["mean"] = jnp.asarray(bn.running_mean.numpy())
        bstats[f"BatchNorm_{i}"]["var"] = jnp.asarray(bn.running_var.numpy())
    with torch.no_grad():
        expected = torch_mlp(t(x)).numpy()
    out = np.asarray(ours.apply({"params": params, "batch_stats": bstats}, x, training=False))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_hstu_layer_parity():
    import torch

    from torch_rechub.basic.layers import HSTULayer as TorchHSTU

    from torch_rechub_tpu.basic.hstu import HSTULayer

    b, l, d, h = 2, 12, 16, 2
    x = rnd(b, l, d, seed=3)
    tds = np.abs(rnd(b, l, seed=4)) * 10000
    mask = np.ones((b, l), dtype=bool)
    mask[0, 8:] = False
    torch_layer = TorchHSTU(d_model=d, n_heads=h, dqk=4, dv=4, dropout=0.0, max_seq_len=l, num_time_buckets=8)
    torch_layer.eval()
    ours = HSTULayer(d_model=d, n_heads=h, dqk=4, dv=4, dropout=0.0, max_seq_len=l, num_time_buckets=8, use_fused_kernel=False)
    variables = ours.init(jax.random.PRNGKey(0), x, padding_mask=mask, time_diffs=tds, training=False)
    params = variables["params"]
    params["norm_in"]["scale"] = jnp.asarray(torch_layer.norm_in.weight.detach().numpy())
    params["norm_in"]["bias"] = jnp.asarray(torch_layer.norm_in.bias.detach().numpy())
    params["proj1"]["kernel"] = jnp.asarray(torch_layer.proj1.weight.detach().numpy().T)
    params["proj1"]["bias"] = jnp.asarray(torch_layer.proj1.bias.detach().numpy())
    params["norm_attn"]["scale"] = jnp.asarray(torch_layer.norm_attn.weight.detach().numpy())
    params["norm_attn"]["bias"] = jnp.asarray(torch_layer.norm_attn.bias.detach().numpy())
    params["proj2"]["kernel"] = jnp.asarray(torch_layer.proj2.weight.detach().numpy().T)
    params["proj2"]["bias"] = jnp.asarray(torch_layer.proj2.bias.detach().numpy())
    params["rab"]["pos_w"] = jnp.asarray(torch_layer.rab.pos_w.detach().numpy())
    params["rab"]["ts_w"] = jnp.asarray(torch_layer.rab.ts_w.detach().numpy())
    import torch as _torch

    with _torch.no_grad():
        expected = torch_layer(t(x), padding_mask=t(mask), time_diffs=t(tds)).numpy()
    out = np.asarray(ours.apply({"params": params}, x, padding_mask=mask, time_diffs=tds, training=False))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_capsule_parity():
    import torch

    from torch_rechub.basic.layers import CapsuleNetwork as TorchCaps

    from torch_rechub_tpu.basic.layers import CapsuleNetwork

    b, l, d, k = 3, 10, 8, 4
    seq = rnd(b, l, d, seed=5)
    mask = np.ones((b, l), dtype=np.float32)
    mask[0, 6:] = 0
    torch_caps = TorchCaps(embedding_dim=d, seq_len=l, bilinear_type=2, interest_num=k, routing_times=3)
    torch_caps.eval()
    with torch.no_grad():
        torch_caps.w.normal_(0, 0.1)
        expected = torch_caps(t(seq), t(mask)).numpy()
    ours = CapsuleNetwork(embedding_dim=d, seq_len=l, bilinear_type=2, interest_num=k, routing_times=3)
    params = ours.init(jax.random.PRNGKey(0), seq, mask)["params"]
    params["w"] = jnp.asarray(torch_caps.w.detach().numpy())
    out = np.asarray(ours.apply({"params": params}, seq, mask))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
