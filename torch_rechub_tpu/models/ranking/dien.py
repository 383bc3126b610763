"""DIEN — Deep Interest Evolution Network (AAAI'2019, arXiv:1809.03672).

Capability parity with ``torch_rechub/models/ranking/dien.py:69-176``: per
history field, a GRU interest extractor with an auxiliary next-step
positive/negative BCE loss, then an attentional AUGRU interest-evolution
layer conditioned on the target item.  Returns ``(logits, alpha*aux_loss)``
— use ``CTRTrainer(loss_mode=False)``.

TPU design: the reference packs variable-length sequences on CPU; here both
recurrences are single ``lax.scan``s over the static (post-padded) time axis
with mask-carried hidden state — no host-side packing, one compiled kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.layers import MLP
from ...ops.embedding import EmbeddingCollection, feature_mask
from ...ops.rnn import GRULayer


class AUGRU(nn.Module):
    """Attentional-update-gate GRU (paper Eq.14-16).

    Attention scores = softmax over valid steps of ``(x W_a) · item``; the
    per-step score scales the update gate.  All-padding rows get uniform
    attention and a zero final state (reference ``dien.py:49-66``).
    """

    embed_dim: int

    @nn.compact
    def __call__(self, seq, item, mask):
        d = self.embed_dim
        xavier = nn.initializers.xavier_uniform()
        wa = self.param("Wa", xavier, (d, d))
        wu, uu, bu = (self.param(n, xavier, s) for n, s in [("Wu", (d, d)), ("Uu", (d, d)), ("bu", (1, d))])
        wr, ur, br = (self.param(n, xavier, s) for n, s in [("Wr", (d, d)), ("Ur", (d, d)), ("br", (1, d))])
        wh, uh, bh = (self.param(n, xavier, s) for n, s in [("Wh", (d, d)), ("Uh", (d, d)), ("bh", (1, d))])

        scores = jnp.einsum("btd,dk,bk->bt", seq, wa, item)
        # -1e9 (not -inf): all-padding rows then softmax to uniform attention
        # with no NaN in forward or backward (reference ``dien.py:58-62``).
        scores = jnp.where(mask > 0, scores, -1e9)
        all_pad = jnp.sum(mask, axis=1) == 0
        attn = jax.nn.softmax(scores, axis=1)

        h0 = jnp.zeros((seq.shape[0], d), seq.dtype)

        def step(h, inputs):
            x_t, a_t = inputs
            u = jax.nn.sigmoid(x_t @ wu + h @ uu + bu)
            r = jax.nn.sigmoid(x_t @ wr + h @ ur + br)
            h_hat = jnp.tanh(x_t @ wh + r * (h @ uh) + bh)
            u_hat = a_t[:, None] * u
            h_new = (1 - u_hat) * h + u_hat * h_hat
            return h_new, h_new

        h_last, _ = jax.lax.scan(step, h0, (jnp.swapaxes(seq, 0, 1), jnp.swapaxes(attn, 0, 1)))
        return jnp.where(all_pad[:, None], 0.0, h_last)


def _auxiliary_loss(outs, pos_emb, neg_emb, mask):
    """Next-step pos/neg BCE over valid adjacent pairs (reference ``dien.py:111-126``)."""
    h = outs[:, :-1]
    pos = pos_emb[:, 1:]
    neg = neg_emb[:, 1:]
    valid = (mask[:, :-1] * mask[:, 1:]).reshape(-1)
    pos_logit = jnp.sum(h * pos, axis=-1).reshape(-1)
    neg_logit = jnp.sum(h * neg, axis=-1).reshape(-1)
    # BCE(sigmoid(l), 1) + BCE(sigmoid(l), 0), stable form
    pos_loss = jnp.maximum(pos_logit, 0) - pos_logit + jnp.log1p(jnp.exp(-jnp.abs(pos_logit)))
    neg_loss = jnp.maximum(neg_logit, 0) + jnp.log1p(jnp.exp(-jnp.abs(neg_logit)))
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum((pos_loss + neg_loss) * valid) / n_valid


class DIEN(nn.Module):
    features: Tuple
    history_features: Tuple
    neg_history_features: Tuple
    target_features: Tuple
    mlp_params: Dict[str, Any]
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x, training: bool = False):
        features = tuple(self.features)
        history = tuple(self.history_features)
        neg_history = tuple(self.neg_history_features)
        target = tuple(self.target_features)
        embedding = EmbeddingCollection(features=features + history + neg_history + target)
        embed_features = embedding(x, features, squeeze_dim=True) if features else None
        embed_history = embedding(x, history)  # (B, H, L, D)
        embed_neg = embedding(x, neg_history)  # (B, H, L, D)
        embed_target = embedding(x, target)  # (B, H, D)

        aux_loss = 0.0
        evolved = []
        for i, fea in enumerate(history):
            seq = embed_history[:, i]
            mask = feature_mask(x, fea)  # (B, L) float
            outs, _ = GRULayer(fea.embed_dim)(seq, mask)
            aux_loss = aux_loss + _auxiliary_loss(outs, seq, embed_neg[:, i], mask)
            h = AUGRU(fea.embed_dim)(outs, embed_target[:, i], mask)
            evolved.append(h[:, None, :])
        evolved = jnp.concatenate(evolved, axis=1)  # (B, H, D)

        b = evolved.shape[0]
        parts = [evolved.reshape(b, -1), embed_target.reshape(b, -1)]
        if embed_features is not None:
            parts.append(embed_features)
        y = MLP(activation="dice", **self.mlp_params)(jnp.concatenate(parts, axis=1), training=training)
        return y.squeeze(-1), self.alpha * aux_loss
