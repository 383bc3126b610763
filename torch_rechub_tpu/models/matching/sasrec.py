"""SASRec (ICDM'2018, arXiv:1808.09781) — self-attentive sequential rec.

Capability parity with ``torch_rechub/models/matching/sasrec.py:17-177``:
causal transformer over the item sequence with pre-LN attention blocks and
conv1x1 FFN; dual API — pair-wise ``(pos_logits, neg_logits)`` over aligned
pos/neg sequences, or two-tower mode via ``item_feature`` where the user
embedding is the last valid position's output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import torch_linear_init
from ...ops.embedding import EmbeddingCollection
from ...basic.precision import compute_dtype


class PointWiseFeedForward(nn.Module):
    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = nn.Dense(self.hidden, kernel_init=torch_linear_init, dtype=compute_dtype())(x)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        out = jax.nn.relu(out)
        out = nn.Dense(self.hidden, kernel_init=torch_linear_init, dtype=compute_dtype())(out)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out + x


class SASRec(nn.Module):
    features: Tuple  # (seq, pos, neg) sequence features sharing one table
    max_len: int = 50
    dropout_rate: float = 0.5
    num_blocks: int = 2
    num_heads: int = 1
    item_feature: Optional[object] = None

    def setup(self):
        feats = tuple(self.features)
        if self.item_feature is not None:
            feats = feats + (self.item_feature,)
        self.item_emb = EmbeddingCollection(features=feats)
        d = self.features[0].embed_dim
        self.position_emb = self.param("position_emb", nn.initializers.normal(1.0), (self.max_len, d))
        self.attn_lns = [nn.LayerNorm(epsilon=1e-8) for _ in range(self.num_blocks)]
        self.attns = [
            nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dropout_rate=self.dropout_rate, kernel_init=torch_linear_init)
            for _ in range(self.num_blocks)
        ]
        self.fwd_lns = [nn.LayerNorm(epsilon=1e-8) for _ in range(self.num_blocks)]
        self.fwds = [PointWiseFeedForward(d, self.dropout_rate) for _ in range(self.num_blocks)]
        self.last_ln = nn.LayerNorm(epsilon=1e-8)
        self.emb_dropout = nn.Dropout(self.dropout_rate)

    def seq_forward(self, x, embed_seq, training: bool = False):
        seq_ids = x[self.features[0].name].astype(jnp.int32)
        b, l = seq_ids.shape
        d = self.features[0].embed_dim
        h = embed_seq * (d**0.5) + self.position_emb[None, :l, :]
        h = self.emb_dropout(h, deterministic=not training)
        valid = (seq_ids != 0)[..., None]
        h = h * valid
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        for ln_a, attn, ln_f, fwd in zip(self.attn_lns, self.attns, self.fwd_lns, self.fwds):
            q = ln_a(h)
            mha = attn(q, h, mask=causal, deterministic=not training)
            h = q + mha
            h = ln_f(h)
            h = fwd(h, training=training)
            h = h * valid
        return self.last_ln(h)

    def user_tower(self, x, training: bool = False, keep_dim: bool = False):
        seq_embed = self.item_emb(x, (self.features[0],))[:, 0]
        seq_output = self.seq_forward(x, seq_embed, training)
        seq_ids = x[self.features[0].name].astype(jnp.int32)
        last_idx = jnp.maximum(jnp.sum(seq_ids != 0, axis=1) - 1, 0)
        user = jnp.take_along_axis(seq_output, last_idx[:, None, None], axis=1)[:, 0]
        return user[:, None, :] if keep_dim else user

    def item_tower(self, x, training: bool = False, keep_dim: bool = False):
        if self.item_feature is None:
            return None
        ids = x[self.item_feature.name].astype(jnp.int32)
        from ...basic.features import table_name

        emb = jnp.take(self.item_emb.table(table_name(self.item_feature)), ids, axis=0)
        return emb[:, None, :] if keep_dim else emb

    def towers(self, x, training: bool = False):
        return self.user_tower(x, training), self.item_tower(x, training)

    def __call__(self, x, training: bool = False, mode=None):
        if mode == "user":
            return self.user_tower(x, training)
        if mode == "item":
            return self.item_tower(x, training)
        if self.item_feature is not None:
            user = self.user_tower(x, training)
            item = self.item_tower(x, training)
            return jnp.sum(user * item, axis=-1)
        embedding = self.item_emb(x, tuple(self.features))  # (B, 3, L, D)
        seq_embed, pos_embed, neg_embed = embedding[:, 0], embedding[:, 1], embedding[:, 2]
        seq_output = self.seq_forward(x, seq_embed, training)
        pos_logits = jnp.sum(seq_output * pos_embed, axis=-1)
        neg_logits = jnp.sum(seq_output * neg_embed, axis=-1)
        return pos_logits, neg_logits
