"""EDCN (DLP-KDD'21) — parallel cross/deep streams with bridge + regulation.

Capability parity with ``torch_rechub/models/ranking/edcn.py:15-101``: per
layer, a CrossLayer step and an MLP step exchange information through a
bridge (hadamard / add / concat / attention) and field-wise regulation gates.

Note: the regulation gates here follow the EDCN paper — softmax over the
*field* axis of ``g/tau``, each field's gate broadcast over its embed dims.
(The reference applies softmax to each scalar independently, which always
yields 1.0 — an inert gate; we implement the intended semantics.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP, CrossLayer, LR, torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class BridgeModule(nn.Module):
    bridge_type: str

    @nn.compact
    def __call__(self, x, h):
        if self.bridge_type == "hadamard_product":
            return x * h
        if self.bridge_type == "pointwise_addition":
            return x + h
        if self.bridge_type == "concatenation":
            d = x.shape[-1]
            return jax.nn.relu(nn.Dense(d, kernel_init=torch_linear_init, dtype=compute_dtype())(jnp.concatenate([x, h], axis=-1)))
        if self.bridge_type == "attention_pooling":
            d = x.shape[-1]

            def att(name, v):
                a = jax.nn.relu(nn.Dense(d, kernel_init=torch_linear_init, name=f"{name}_1", dtype=compute_dtype())(v))
                a = nn.Dense(d, use_bias=False, kernel_init=torch_linear_init, name=f"{name}_2", dtype=compute_dtype())(a)
                return jax.nn.softmax(a, axis=-1)

            return att("attention_x", x) * x + att("attention_h", h) * h
        raise ValueError(f"bridge_type={self.bridge_type} is not supported")


class RegulationModule(nn.Module):
    num_fields: int
    fea_dims: Tuple[int, ...]
    tau: float = 1.0
    use_regulation: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.use_regulation:
            return x, x
        g1 = self.param("g1", nn.initializers.ones, (self.num_fields,))
        g2 = self.param("g2", nn.initializers.ones, (self.num_fields,))
        rep = jnp.array(self.fea_dims)

        def gate(g):
            s = jax.nn.softmax(g / self.tau, axis=-1) * self.num_fields
            return jnp.repeat(s, rep, total_repeat_length=int(sum(self.fea_dims)))

        return gate(g1) * x, gate(g2) * x


class EDCN(nn.Module):
    features: Tuple
    n_cross_layers: int
    mlp_params: Dict[str, Any]
    bridge_type: str = "hadamard_product"
    use_regulation_module: bool = True
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        dims = sum(f.embed_dim for f in features)
        fea_dims = tuple(f.embed_dim for f in features)
        embed_x = EmbeddingCollection(features=features)(x, features, squeeze_dim=True)
        mlp_params = dict(self.mlp_params)
        mlp_params["dims"] = (dims, dims)

        regulations = [RegulationModule(len(features), fea_dims, self.temperature, self.use_regulation_module) for _ in range(self.n_cross_layers)]
        cross_i, deep_i = regulations[0](embed_x)
        cross_0 = cross_i
        bridge_i = None
        for i in range(self.n_cross_layers):
            if i > 0:
                cross_i, deep_i = regulations[i](bridge_i)
            cross_i = cross_i + CrossLayer()(cross_0, cross_i)
            deep_i = MLP(output_layer=False, **mlp_params)(deep_i, training=training)
            bridge_i = BridgeModule(self.bridge_type)(cross_i, deep_i)
        x_stack = jnp.concatenate([cross_i, deep_i, bridge_i], axis=1)
        return LR()(x_stack).squeeze(-1)
