"""DIN — Deep Interest Network (KDD'2018, arXiv:1706.06978).

Capability parity with ``torch_rechub/models/ranking/din.py:16-93``: per
history field, an ActivationUnit scores each position against the target
(``concat[t, h, t-h, t*h] -> MLP``) and produces a weighted-sum interest
vector; interests + target + profile features feed a Dice MLP head.

TPU note: the reference flattens to ``(B*L, 4D)`` for its MLP; here the MLP
broadcasts over ``(B, L, 4D)`` directly (BatchNorm statistics over B and L —
numerically identical to BatchNorm1d on the flattened view).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection


class ActivationUnit(nn.Module):
    """Target attention over a behaviour sequence -> pooled interest ``(B, D)``."""

    emb_dim: int
    dims: Tuple[int, ...] = (36,)
    activation: str = "dice"
    use_softmax: bool = False

    @nn.compact
    def __call__(self, history, target, training: bool = False):
        # history (B, L, D); target (B, D)
        seq_len = history.shape[1]
        t = jnp.broadcast_to(target[:, None, :], history.shape)
        att_input = jnp.concatenate([t, history, t - history, t * history], axis=-1)
        att_weight = MLP(dims=self.dims, activation=self.activation)(att_input, training=training)
        att_weight = att_weight[..., 0]  # (B, L)
        if self.use_softmax:
            att_weight = jax.nn.softmax(att_weight, axis=-1)
        return jnp.einsum("bl,bld->bd", att_weight, history)


class DIN(nn.Module):
    features: Tuple
    history_features: Tuple
    target_features: Tuple
    mlp_params: Dict[str, Any]
    attention_mlp_params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        history = tuple(self.history_features)
        target = tuple(self.target_features)
        embedding = EmbeddingCollection(features=features + history + target)
        embed_features = embedding(x, features)  # (B, F, D)
        embed_history = embedding(x, history)  # (B, H, L, D) (pooling="concat")
        embed_target = embedding(x, target)  # (B, H, D)

        interests = []
        for i, fea in enumerate(history):
            att = ActivationUnit(fea.embed_dim, **self.attention_mlp_params)(embed_history[:, i], embed_target[:, i], training=training)
            interests.append(att[:, None, :])
        interest = jnp.concatenate(interests, axis=1)  # (B, H, D)

        b = interest.shape[0]
        mlp_in = jnp.concatenate([interest.reshape(b, -1), embed_target.reshape(b, -1), embed_features.reshape(b, -1)], axis=1)
        y = MLP(activation="dice", **self.mlp_params)(mlp_in, training=training)
        return y.squeeze(-1)
