"""TIGER — generative retrieval over semantic IDs (arXiv:2305.05065).

The reference wraps HuggingFace ``T5ForConditionalGeneration`` with a
temperature ranking loss (``torch_rechub/models/generative/tiger.py:8-161``).
Here TIGER is a compact in-repo encoder-decoder (pre-norm transformer,
shared token embedding, tied LM head with the T5 ``d_model**-0.5`` rescale)
— no external LLM dependency, fully jittable, with greedy and beam
``generate`` supporting trie-constrained decoding over valid semantic-id
sequences (``utils/tiger.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...basic.layers import torch_linear_init
from ...basic.precision import compute_dtype


class _MHA(nn.Module):
    d_model: int
    n_heads: int
    dropout: float

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, training: bool = False):
        d, h = self.d_model, self.n_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, use_bias=False, kernel_init=torch_linear_init, name=name, dtype=compute_dtype())
        q = dense("q")(q_in).reshape(*q_in.shape[:-1], h, hd)
        k = dense("k")(kv_in).reshape(*kv_in.shape[:-1], h, hd)
        v = dense("v")(kv_in).reshape(*kv_in.shape[:-1], h, hd)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / (hd**0.5)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(*q_in.shape[:-1], d)
        return dense("o")(out)


class _FFN(nn.Module):
    d_model: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = jax.nn.relu(nn.Dense(self.d_ff, use_bias=False, kernel_init=torch_linear_init, dtype=compute_dtype())(x))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(self.d_model, use_bias=False, kernel_init=torch_linear_init, dtype=compute_dtype())(h)


class _EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        h = nn.LayerNorm(use_bias=False)(x)
        x = x + nn.Dropout(self.dropout, deterministic=not training)(_MHA(self.d_model, self.n_heads, self.dropout)(h, h, mask, training))
        h = nn.LayerNorm(use_bias=False)(x)
        return x + nn.Dropout(self.dropout, deterministic=not training)(_FFN(self.d_model, self.d_ff, self.dropout)(h, training))


class _DecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, enc, self_mask, cross_mask, training: bool = False):
        h = nn.LayerNorm(use_bias=False)(x)
        x = x + nn.Dropout(self.dropout, deterministic=not training)(_MHA(self.d_model, self.n_heads, self.dropout, name="self_attn")(h, h, self_mask, training))
        h = nn.LayerNorm(use_bias=False)(x)
        x = x + nn.Dropout(self.dropout, deterministic=not training)(_MHA(self.d_model, self.n_heads, self.dropout, name="cross_attn")(h, enc, cross_mask, training))
        h = nn.LayerNorm(use_bias=False)(x)
        return x + nn.Dropout(self.dropout, deterministic=not training)(_FFN(self.d_model, self.d_ff, self.dropout)(h, training))


class TIGERModel(nn.Module):
    """Compact T5-style seq2seq over semantic-id tokens.

    ``__call__(input_ids, attention_mask, labels)`` mirrors the reference's HF
    signature: labels are shifted right (``decoder_start=pad``) to form decoder
    inputs; returns ``(loss, logits)`` with the temperature ranking loss
    (``tiger.py:27-35``), label padding ``-100`` ignored.
    """

    vocab_size: int
    d_model: int = 128
    n_heads: int = 4
    n_enc_layers: int = 2
    n_dec_layers: int = 2
    d_ff: int = 512
    dropout: float = 0.1
    max_len: int = 128
    pad_token_id: int = 0
    temperature: float = 1.0

    def setup(self):
        init = nn.initializers.normal(1.0 / (self.d_model**0.5))
        self.shared = self.param("shared_embedding", init, (self.vocab_size, self.d_model))
        self.enc_pos = self.param("enc_pos", init, (self.max_len, self.d_model))
        self.dec_pos = self.param("dec_pos", init, (self.max_len, self.d_model))
        self.enc_layers = [_EncoderLayer(self.d_model, self.n_heads, self.d_ff, self.dropout) for _ in range(self.n_enc_layers)]
        self.dec_layers = [_DecoderLayer(self.d_model, self.n_heads, self.d_ff, self.dropout) for _ in range(self.n_dec_layers)]
        self.enc_final_ln = nn.LayerNorm(use_bias=False)
        self.dec_final_ln = nn.LayerNorm(use_bias=False)

    def encode(self, input_ids, attention_mask=None, training: bool = False):
        input_ids = input_ids.astype(jnp.int32)
        if attention_mask is None:
            attention_mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        x = jnp.take(self.shared, input_ids, axis=0) + self.enc_pos[None, : input_ids.shape[1]]
        mask = attention_mask[:, None, None, :].astype(bool)
        for layer in self.enc_layers:
            x = layer(x, mask, training)
        return self.enc_final_ln(x), attention_mask

    def decode(self, decoder_input_ids, enc, enc_mask, training: bool = False):
        decoder_input_ids = decoder_input_ids.astype(jnp.int32)
        l = decoder_input_ids.shape[1]
        x = jnp.take(self.shared, decoder_input_ids, axis=0) + self.dec_pos[None, :l]
        self_mask = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        cross_mask = enc_mask[:, None, None, :].astype(bool)
        for layer in self.dec_layers:
            x = layer(x, enc, self_mask, cross_mask, training)
        x = self.dec_final_ln(x)
        # T5 tied-embedding rescale before projecting on vocab
        return jnp.einsum("bld,vd->blv", x * (self.d_model**-0.5), self.shared)

    def shift_right(self, labels):
        start = jnp.full((labels.shape[0], 1), self.pad_token_id, labels.dtype)
        shifted = jnp.concatenate([start, labels[:, :-1]], axis=1)
        return jnp.where(shifted == -100, self.pad_token_id, shifted)

    def __call__(self, input_ids, attention_mask=None, labels=None, decoder_input_ids=None, training: bool = False):
        enc, enc_mask = self.encode(input_ids, attention_mask, training)
        if decoder_input_ids is None:
            if labels is None:
                raise ValueError("provide labels or decoder_input_ids")
            decoder_input_ids = self.shift_right(labels)
        logits = self.decode(decoder_input_ids, enc, enc_mask, training)
        loss = None
        if labels is not None:
            loss = self.ranking_loss(logits, labels)
        return loss, logits

    def ranking_loss(self, lm_logits, labels):
        """Temperature-scaled CE ignoring ``-100`` labels (reference ``tiger.py:27-35``)."""
        t_logits = lm_logits / self.temperature
        mask = (labels != -100).astype(jnp.float32)
        safe = jnp.where(labels == -100, 0, labels).astype(jnp.int32)
        logp = jax.nn.log_softmax(t_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def generate(model: TIGERModel, variables, input_ids, max_new_tokens: int, num_beams: int = 1, trie=None, eos_token_id: Optional[int] = None):
    """Greedy / beam decoding with optional prefix-trie constraints.

    ``trie`` is a ``utils.tiger.Trie``; at each step only children of the
    generated prefix are allowed (the reference uses HF constrained beam
    search with ``prefix_allowed_tokens_fn``).  Host-side loop — decode
    lengths for semantic ids are tiny (3-5 tokens).
    """
    input_ids = np.asarray(input_ids)
    b = input_ids.shape[0]
    enc, enc_mask = model.apply(variables, jnp.asarray(input_ids), method=TIGERModel.encode)

    # simple beam search (scores = sum log prob); host loop, 3-5 step decodes
    beams = [[(0.0, [model.pad_token_id])] for _ in range(b)]
    finished = [[] for _ in range(b)]
    for _t in range(max_new_tokens):
        all_dec, all_scores, meta = [], [], []
        for i in range(b):
            for score, toks in beams[i]:
                all_dec.append(toks)
                all_scores.append(score)
                meta.append(i)
        maxlen = max(len(t) for t in all_dec)
        dec = np.zeros((len(all_dec), maxlen), dtype=np.int32)
        for r, toks in enumerate(all_dec):
            dec[r, : len(toks)] = toks
        enc_rep = jnp.take(enc, jnp.asarray(meta), axis=0)
        enc_m = jnp.take(enc_mask, jnp.asarray(meta), axis=0)
        step = model.apply(variables, jnp.asarray(dec), enc_rep, enc_m, method=TIGERModel.decode)[:, -1, :]
        logits = np.asarray(jax.nn.log_softmax(step, axis=-1))
        new_beams = [[] for _ in range(b)]
        for r, i in enumerate(meta):
            score, toks = all_scores[r], all_dec[r]
            row = logits[r]
            if trie is not None:
                allowed = trie.allowed_next(tuple(toks[1:]))
                if not allowed:
                    continue
                cand = sorted(allowed, key=lambda t: -row[t])[:num_beams]
            else:
                cand = np.argsort(-row)[:num_beams].tolist()
            for t in cand:
                nb = (score + float(row[t]), toks + [int(t)])
                if eos_token_id is not None and t == eos_token_id:
                    finished[i].append(nb)
                else:
                    new_beams[i].append(nb)
        beams = [sorted(nb, key=lambda x: -x[0])[:num_beams] if nb else beams[i][:1] for i, nb in enumerate(new_beams)]
    out = []
    for i in range(b):
        pool = finished[i] + beams[i]
        pool = sorted(pool, key=lambda x: -x[0])
        out.append([toks[1:] for _score, toks in pool[:num_beams]])
    return out
