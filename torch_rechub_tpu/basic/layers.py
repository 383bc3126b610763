"""Core layer zoo (flax.linen), TPU-first.

Capability parity with ``torch_rechub/basic/layers.py`` — MLP, LR, FM, CIN,
CrossNet v1/v2/Mix, SENet, bilinear interaction, AutoInt interacting layer,
multi-interest (self-attentive + capsule routing), FFM, CEN — re-designed for
XLA: expert/pair loops become einsums over stacked parameter tensors (one big
MXU matmul instead of N small ones), sequence ops are mask-aware and static-
shaped, and everything is jit-traceable with no data-dependent Python control
flow.  The shared embedding abstraction lives in
``torch_rechub_tpu.ops.embedding.EmbeddingCollection``.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activation import activation_layer
from .precision import cast_compute, compute_dtype

# torch.nn.Linear's default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
# Used across the zoo so training dynamics track the reference closely.
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _dense(features: int, use_bias: bool = True, name: Optional[str] = None):
    """Zoo-standard Dense: torch init, params f32, compute in the active
    precision (bf16 under the mixed-precision policy — see basic/precision.py)."""
    return nn.Dense(features, use_bias=use_bias, kernel_init=torch_linear_init, dtype=compute_dtype(), name=name)


def prediction(x, task_type: str = "classification"):
    """Head transform: sigmoid for classification, identity for regression.

    Reference ``PredictionLayer`` (``basic/layers.py:12-30``).
    """
    if task_type not in ("classification", "regression"):
        raise ValueError("task_type must be classification or regression")
    return jax.nn.sigmoid(x) if task_type == "classification" else x


class LR(nn.Module):
    """First-order linear term ``(B, D) -> (B, 1)``; optional sigmoid.

    Reference ``LR`` (``basic/layers.py:164-189``).
    """

    sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        out = _dense(1)(x)
        return jax.nn.sigmoid(out) if self.sigmoid else out


class MLP(nn.Module):
    """Dense -> BatchNorm -> activation -> dropout per hidden layer.

    Matches reference ``MLP`` (``basic/layers.py:254-292``) incl. the optional
    final ``Dense(1)``.  BatchNorm uses torch semantics (momentum 0.1 on new
    stats, eps 1e-5); running stats live in the ``batch_stats`` collection.
    """

    dims: Sequence[int] = ()
    output_layer: bool = True
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, training: bool = False):
        for dim in self.dims:
            x = _dense(dim)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)(x)
            x = activation_layer(self.activation)(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not training)(x)
        if self.output_layer:
            x = _dense(1)(x)
        return x


class FM(nn.Module):
    """Second-order FM interaction ``0.5 * ((Σv)^2 − Σv^2)``.

    Reference ``FM`` (``basic/layers.py:295-319``); input ``(B, F, D)``.
    """

    reduce_sum: bool = True

    @nn.compact
    def __call__(self, x):
        square_of_sum = jnp.sum(x, axis=1) ** 2
        sum_of_square = jnp.sum(x**2, axis=1)
        ix = square_of_sum - sum_of_square
        if self.reduce_sum:
            ix = jnp.sum(ix, axis=1, keepdims=True)
        return 0.5 * ix


class CIN(nn.Module):
    """Compressed Interaction Network (xDeepFM).

    Reference ``CIN`` (``basic/layers.py:322-368``).  The per-layer Conv1d with
    kernel-size 1 is an einsum over the flattened outer-product channels — a
    single MXU matmul per layer.
    """

    input_dim: int  # number of fields F0
    cin_size: Sequence[int]
    split_half: bool = True

    @nn.compact
    def __call__(self, x):
        xs = []
        x0, h = x, x  # (B, F0, D), (B, Fi, D)
        for i, size in enumerate(self.cin_size):
            # outer product over field axes: (B, F0*Fi, D)
            z = (x0[:, :, None, :] * h[:, None, :, :]).reshape(x.shape[0], -1, x.shape[-1])
            w = cast_compute(self.param(f"conv_w_{i}", torch_linear_init, (size, z.shape[1])))
            b = cast_compute(self.param(f"conv_b_{i}", nn.initializers.zeros, (size,)))
            out = jax.nn.relu(jnp.einsum("bcd,oc->bod", z, w) + b[None, :, None])
            if self.split_half and i != len(self.cin_size) - 1:
                out, h = jnp.split(out, 2, axis=1)
            else:
                h = out
            xs.append(out)
        pooled = jnp.sum(jnp.concatenate(xs, axis=1), axis=2)
        return _dense(1)(pooled)


class CrossLayer(nn.Module):
    """One DCN cross step ``w(x_i)·x_0 + b`` (reference ``basic/layers.py:371-387``)."""

    @nn.compact
    def __call__(self, x0, xi):
        d = x0.shape[-1]
        xw = _dense(1, use_bias=False)(xi)
        b = cast_compute(self.param("b", nn.initializers.zeros, (d,)))
        return x0 * xw + b


class CrossNetwork(nn.Module):
    """DCN v1 cross network with residual: ``x = x0·(w x) + b + x``.

    Reference ``CrossNetwork`` (``basic/layers.py:390-420``).
    """

    num_layers: int

    @nn.compact
    def __call__(self, x):
        x0 = x
        d = x.shape[-1]
        for i in range(self.num_layers):
            xw = _dense(1, use_bias=False, name=f"w_{i}")(x)
            b = cast_compute(self.param(f"b_{i}", nn.initializers.zeros, (d,)))
            x = x0 * xw + b + x
        return x


class CrossNetV2(nn.Module):
    """DCN v2 full-matrix cross network (reference ``basic/layers.py:423-444``)."""

    num_layers: int

    @nn.compact
    def __call__(self, x):
        x0 = x
        d = x.shape[-1]
        for i in range(self.num_layers):
            xw = _dense(d, use_bias=False, name=f"w_{i}")(x)
            b = cast_compute(self.param(f"b_{i}", nn.initializers.zeros, (d,)))
            x = x0 * xw + b + x
        return x


class CrossNetMix(nn.Module):
    """DCN v2 low-rank mixture-of-experts cross network.

    Reference ``CrossNetMix`` (``basic/layers.py:447-506``): per expert
    ``x0 * (U tanh(C tanh(V^T x)) + b)``, softmax-gated over experts.  The
    reference loops over experts in Python; here all experts are one stacked
    einsum per layer so the MXU sees a single batched matmul.
    """

    num_layers: int = 2
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        xavier = nn.initializers.xavier_normal()
        x0 = x  # (B, D)
        xl = x
        gate_w = cast_compute(self.param("gate_w", torch_linear_init, (self.num_experts, d)))
        for i in range(self.num_layers):
            u = cast_compute(self.param(f"u_{i}", xavier, (self.num_experts, d, self.low_rank)))
            v = cast_compute(self.param(f"v_{i}", xavier, (self.num_experts, d, self.low_rank)))
            c = cast_compute(self.param(f"c_{i}", xavier, (self.num_experts, self.low_rank, self.low_rank)))
            b = cast_compute(self.param(f"b_{i}", nn.initializers.zeros, (d,)))
            # gate scores per expert: (B, E)
            gate = jnp.einsum("bd,ed->be", xl, gate_w)
            vx = jnp.tanh(jnp.einsum("edr,bd->ber", v, xl))
            cvx = jnp.tanh(jnp.einsum("ers,bes->ber", c, vx))
            uv = jnp.einsum("edr,ber->bed", u, cvx)  # (B, E, D)
            expert_out = x0[:, None, :] * (uv + b)  # Hadamard with x0
            moe = jnp.einsum("bed,be->bd", expert_out, jax.nn.softmax(gate.astype(jnp.float32), axis=1).astype(expert_out.dtype))
            xl = moe + xl
        return xl


class SENETLayer(nn.Module):
    """Squeeze-excitation field gating (FiBiNet; reference ``basic/layers.py:509-529``)."""

    num_fields: int
    reduction_ratio: int = 3

    @nn.compact
    def __call__(self, x):
        reduced = max(1, self.num_fields // self.reduction_ratio)
        z = jnp.mean(x, axis=-1)  # (B, F)
        a = jax.nn.relu(_dense(reduced, use_bias=False)(z))
        a = jax.nn.relu(_dense(self.num_fields, use_bias=False)(a))
        return x * a[..., None]


class BiLinearInteractionLayer(nn.Module):
    """Pairwise bilinear field crosses (FiBiNet).

    Reference ``BiLinearInteractionLayer`` (``basic/layers.py:532-565``); the
    per-pair Linear list becomes one stacked ``(P, D, D)`` tensor + einsum.
    """

    num_fields: int
    bilinear_type: str = "field_interaction"

    @nn.compact
    def __call__(self, x):
        b, f, d = x.shape
        pairs = list(combinations(range(f), 2))
        i_idx = jnp.array([i for i, _ in pairs])
        j_idx = jnp.array([j for _, j in pairs])
        if self.bilinear_type == "field_all":
            w = cast_compute(self.param("w", torch_linear_init, (d, d)))
            proj = jnp.einsum("bfd,de->bfe", x, w)
            out = proj[:, i_idx, :] * x[:, j_idx, :]
        elif self.bilinear_type == "field_each":
            w = cast_compute(self.param("w", torch_linear_init, (f, d, d)))
            proj = jnp.einsum("bfd,fde->bfe", x, w)
            out = proj[:, i_idx, :] * x[:, j_idx, :]
        elif self.bilinear_type == "field_interaction":
            w = cast_compute(self.param("w", torch_linear_init, (len(pairs), d, d)))
            out = jnp.einsum("bpd,pde->bpe", x[:, i_idx, :], w) * x[:, j_idx, :]
        else:
            raise NotImplementedError(self.bilinear_type)
        return out


class InteractingLayer(nn.Module):
    """AutoInt multi-head self-attention over fields with residual + ReLU.

    Reference ``InteractingLayer`` (``basic/layers.py:973-1044``).
    """

    embed_dim: int
    num_heads: int = 2
    dropout: float = 0.0
    residual: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        b, f, d = x.shape
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name: _dense(self.embed_dim, use_bias=False, name=name)
        q = dense("W_Q")(x).reshape(b, f, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("W_K")(x).reshape(b, f, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("W_V")(x).reshape(b, f, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhfd,bhgd->bhfg", q, k) * (head_dim**-0.5)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        if self.dropout > 0:
            weights = nn.Dropout(rate=self.dropout, deterministic=not training)(weights)
        out = jnp.einsum("bhfg,bhgd->bhfd", weights, v).transpose(0, 2, 1, 3).reshape(b, f, d)
        if self.residual:
            out = out + dense("W_Res")(x)
        return jax.nn.relu(out)


class MultiInterestSA(nn.Module):
    """Self-attentive multi-interest extraction (Comirec-SA).

    Reference ``MultiInterestSA`` (``basic/layers.py:568-609``).
    Input ``(B, L, D)`` + mask ``(B, L, 1)``; output ``(B, K, D)``.
    """

    embedding_dim: int
    interest_num: int
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, seq_emb, mask=None):
        hidden = self.hidden_dim or self.embedding_dim * 4
        uniform = nn.initializers.uniform(scale=1.0)
        w1 = cast_compute(self.param("W1", uniform, (self.embedding_dim, hidden)))
        w2 = cast_compute(self.param("W2", uniform, (hidden, self.interest_num)))
        h = jnp.tanh(jnp.einsum("bse,ed->bsd", seq_emb, w1))
        logits = jnp.einsum("bsd,dk->bsk", h, w2)
        if mask is not None:
            logits = logits + -1e9 * (1.0 - mask.astype(logits.dtype))
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(seq_emb.dtype)  # over positions
        return jnp.einsum("bsk,bsd->bkd", attn, seq_emb)


def _squash(caps):
    """Capsule squash ``|v|^2/(1+|v|^2) * v/|v|``."""
    norm_sq = jnp.sum(caps**2, axis=-1, keepdims=True)
    return (norm_sq / (1.0 + norm_sq)) * caps / jnp.sqrt(norm_sq + 1e-9)


class CapsuleNetwork(nn.Module):
    """Dynamic-routing capsule multi-interest extraction (MIND / Comirec-DR).

    Reference ``CapsuleNetwork`` (``basic/layers.py:612-711``): bilinear_type
    0 = shared linear map (MIND), 1 = per-interest linear, 2 = per-position
    per-interest weight tensor (Comirec-DR); 3 routing iterations with
    stop-gradient on the routed inputs except the final readout.
    """

    embedding_dim: int
    seq_len: int
    bilinear_type: int = 2
    interest_num: int = 4
    routing_times: int = 3
    relu_layer: bool = False

    @nn.compact
    def __call__(self, item_eb, mask, routing_rng=None):
        b = item_eb.shape[0]
        k, l, d = self.interest_num, self.seq_len, self.embedding_dim
        if self.bilinear_type == 0:
            proj = _dense(d, use_bias=False)(item_eb)
            hat = jnp.tile(proj, (1, 1, k))
        elif self.bilinear_type == 1:
            hat = _dense(d * k, use_bias=False)(item_eb)
        else:
            w = self.param("w", nn.initializers.uniform(1.0), (1, l, k * d, d))
            hat = jnp.sum(w[:, :l, :, :] * item_eb[:, :, None, :], axis=3)
        # (B, L, K*D) -> (B, K, L, D)
        hat = hat.reshape(b, l, k, d).transpose(0, 2, 1, 3)
        hat_iter = jax.lax.stop_gradient(hat)

        if self.bilinear_type > 0:
            weight = jnp.zeros((b, k, l), dtype=hat.dtype)
        else:
            if routing_rng is None:
                # deterministic fallback at inference (no rng stream supplied)
                routing_rng = self.make_rng("routing") if self.has_rng("routing") else jax.random.PRNGKey(0)
            weight = jax.random.normal(routing_rng, (b, k, l), dtype=hat.dtype)

        attn_mask = jnp.broadcast_to(mask.reshape(b, 1, l), (b, k, l))
        capsule = None
        for i in range(self.routing_times):
            soft = jax.nn.softmax(weight, axis=-1)
            soft = jnp.where(attn_mask == 0, 0.0, soft)
            src = hat_iter if i < self.routing_times - 1 else hat
            capsule = _squash(jnp.einsum("bkl,bkld->bkd", soft, src))
            if i < self.routing_times - 1:
                weight = weight + jnp.einsum("bkld,bkd->bkl", hat_iter, capsule)
        if self.relu_layer:
            capsule = jax.nn.relu(_dense(d, use_bias=False)(capsule))
        return capsule


class FFM(nn.Module):
    """Field-aware second-order crosses.

    Reference ``FFM`` (``basic/layers.py:714-746``): input ``(B, F, F, D)``
    field-aware embeddings, output the F(F-1)/2 Hadamard (or inner) products —
    vectorized over the upper-triangle index pairs.
    """

    num_fields: int
    reduce_sum: bool = True

    @nn.compact
    def __call__(self, x):
        pairs = list(combinations(range(self.num_fields), 2))
        i_idx = jnp.array([i for i, _ in pairs])
        j_idx = jnp.array([j for _, j in pairs])
        crossed = x[:, i_idx, j_idx, :] * x[:, j_idx, i_idx, :]
        if self.reduce_sum:
            crossed = jnp.sum(crossed, axis=-1, keepdims=True)
        return crossed


class CEN(nn.Module):
    """Compose-excitation attention over field crosses (FAT-DeepFFM).

    Reference ``CEN`` (``basic/layers.py:749-786``).
    """

    embed_dim: int
    num_field_crosses: int
    reduction_ratio: int

    @nn.compact
    def __call__(self, em, training: bool = False):
        u = self.param("u", nn.initializers.uniform(1.0), (self.num_field_crosses, self.embed_dim))
        d = jax.nn.relu(jnp.sum(u * em, axis=-1))  # (B, P)
        s = MLP(dims=(self.num_field_crosses // self.reduction_ratio, self.num_field_crosses), output_layer=False)(d, training=training)
        return (s[..., None] * em).reshape(em.shape[0], -1)
