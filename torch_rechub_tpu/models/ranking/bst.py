"""BST — Behavior Sequence Transformer (arXiv:1905.06874).

Capability parity with ``torch_rechub/models/ranking/bst.py:16-90``: history
item vectors + the target appended as the last step, learned positions, a
post-norm transformer encoder with LeakyReLU FFN and key-padding masking;
the target position's output is the interest representation fed to the MLP.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP, torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class TransformerEncoderLayer(nn.Module):
    """Post-norm MHA + FFN block (torch ``nn.TransformerEncoderLayer`` semantics)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, training: bool = False):
        # key_padding_mask: (B, L) bool, True = PAD (masked out as attention key)
        attn_mask = None
        if key_padding_mask is not None:
            attn_mask = ~key_padding_mask[:, None, None, :]  # True = attend
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            dropout_rate=self.dropout,
            deterministic=not training,
            kernel_init=torch_linear_init,
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout, deterministic=not training)(attn))
        ff = nn.Dense(self.dim_feedforward, kernel_init=torch_linear_init, dtype=compute_dtype())(x)
        ff = jax.nn.leaky_relu(ff, negative_slope=0.01)
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        ff = nn.Dense(self.d_model, kernel_init=torch_linear_init, dtype=compute_dtype())(ff)
        return nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout, deterministic=not training)(ff))


class BST(nn.Module):
    features: Tuple
    history_features: Tuple
    target_features: Tuple
    mlp_params: Dict[str, Any]
    nhead: int = 8
    dropout: float = 0.2
    num_layers: int = 1
    max_seq_len: int = 51
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        history = tuple(self.history_features)
        target = tuple(self.target_features)
        item_dim = sum(f.embed_dim for f in history)
        target_dim = sum(f.embed_dim for f in target)
        if item_dim != target_dim:
            raise ValueError(f"sum of history embed_dim ({item_dim}) must equal target embed_dim ({target_dim})")
        if item_dim % self.nhead != 0:
            raise ValueError(f"item_dim ({item_dim}) must be divisible by nhead ({self.nhead})")

        embedding = EmbeddingCollection(features=features + history + target)
        embed_features = embedding(x, features, squeeze_dim=True) if features else None
        embed_history = embedding(x, history)  # (B, H, L, D)
        embed_target = embedding(x, target)  # (B, K, D)

        b, _, seq_len, _ = embed_history.shape
        hist = jnp.concatenate([embed_history[:, i] for i in range(len(history))], axis=-1)  # (B, L, item_dim)
        tgt = jnp.concatenate([embed_target[:, i] for i in range(len(target))], axis=-1)  # (B, item_dim)
        seq = jnp.concatenate([hist, tgt[:, None, :]], axis=1)  # (B, L+1, item_dim)
        if seq.shape[1] > self.max_seq_len:
            raise ValueError(f"sequence length {seq.shape[1]} exceeds max_seq_len {self.max_seq_len}")
        pos_table = self.param("pos_embedding", nn.initializers.normal(1.0), (self.max_seq_len, item_dim))
        seq = seq + pos_table[None, : seq.shape[1], :]

        # a position is PAD only if ALL history features are padding there
        pad = jnp.ones((b, seq_len), dtype=bool)
        for fea in history:
            pidx = fea.padding_idx if fea.padding_idx is not None else 0
            pad = pad & (x[fea.name].astype(jnp.int32) == pidx)
        key_padding = jnp.concatenate([pad, jnp.zeros((b, 1), dtype=bool)], axis=1)

        out = seq
        for _ in range(self.num_layers):
            out = TransformerEncoderLayer(item_dim, self.nhead, self.dim_feedforward, self.dropout)(out, key_padding, training=training)
        interest = out[:, -1, :]

        parts = [interest, embed_target.reshape(b, -1)]
        if embed_features is not None:
            parts.append(embed_features)
        y = MLP(**self.mlp_params)(jnp.concatenate(parts, axis=1), training=training)
        return y.squeeze(-1)
