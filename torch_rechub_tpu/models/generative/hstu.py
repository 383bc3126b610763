"""HSTUModel — generative sequence recommender (arXiv:2402.17152).

Capability parity with ``torch_rechub/models/generative/hstu.py:10-273``:
token + position + bucketed-time embeddings (PAD rows zeroed), HSTUBlock
stack, tied (or separate) output projection, optional L2-normalized scoring
with temperature, and the ``max_seq_len`` guard.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...basic.hstu import HSTUBlock
from ...basic.precision import compute_dtype
from ...utils.hstu_utils import bucketize_time


class HSTUModel(nn.Module):
    vocab_size: int
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 4
    dqk: int = 64
    dv: int = 64
    max_seq_len: int = 256
    dropout: float = 0.1
    use_time_embedding: bool = True
    num_time_buckets: int = 128
    time_bucket_fn: str = "sqrt"
    time_bucket_divisor: float = 1.0
    time_bucket_unit: str = "minutes"
    tie_embeddings: bool = True
    score_norm: str = "none"
    temperature: float = 1.0
    use_output_bias: bool = True
    scale_input_embedding: bool = False
    l2_norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, time_diffs=None, training: bool = False, return_hidden: bool = False):
        if self.score_norm not in ("none", "l2"):
            raise ValueError("score_norm must be 'none' or 'l2'")
        b, l = x.shape
        if l > self.max_seq_len:
            raise ValueError(f"Input seq_len ({l}) exceeds max_seq_len ({self.max_seq_len}).")
        x = x.astype(jnp.int32)
        padding_mask = x != 0

        xavier = nn.initializers.xavier_uniform()
        token_table = self.param("token_embedding", lambda k, s: xavier(k, s).at[0].set(0.0), (self.vocab_size, self.d_model))
        pos_table = self.param("position_embedding", xavier, (self.max_seq_len, self.d_model))

        token_emb = jnp.take(token_table, x, axis=0)
        # Sparse-gradient hooks on the INPUT-side gather (trainers/sparse.py):
        # only meaningful when the table is untied — a tied output projection
        # feeds the table a dense gradient through the CE logits matmul, so
        # SeqTrainer(sparse_embedding=...) requires tie_embeddings=False.
        if not self.tie_embeddings:
            if self.is_mutable_collection("perturbations") or self.has_variable("perturbations", "demb_named_token_embedding"):
                token_emb = self.perturb("demb_named_token_embedding", token_emb)
            self.sow("embedding_ids", "ids_named_token_embedding", x)
        if self.scale_input_embedding:
            token_emb = token_emb * (self.d_model**0.5)
        emb = token_emb + pos_table[None, :l, :]

        if self.use_time_embedding:
            time_table = self.param("time_embedding", xavier, (self.num_time_buckets, self.d_model))
            td = time_diffs if time_diffs is not None else jnp.zeros((b, l), jnp.int32)
            buckets = bucketize_time(td, self.num_time_buckets, self.time_bucket_fn, self.time_bucket_divisor, self.time_bucket_unit, max_bucket=self.num_time_buckets - 1)
            emb = emb + jnp.take(time_table, buckets, axis=0)

        emb = emb * padding_mask[..., None].astype(emb.dtype)
        # the transformer stack runs in the compute dtype (bf16 under mixed
        # precision); embeddings/tables stay f32 params
        emb = nn.Dropout(self.dropout, deterministic=not training)(emb).astype(compute_dtype())

        out = HSTUBlock(
            d_model=self.d_model,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            dqk=self.dqk,
            dv=self.dv,
            dropout=self.dropout,
            max_seq_len=self.max_seq_len,
            num_time_buckets=self.num_time_buckets,
            time_bucket_fn=self.time_bucket_fn,
            time_bucket_divisor=self.time_bucket_divisor,
            time_bucket_unit=self.time_bucket_unit,
            name="hstu_block",
        )(emb, padding_mask=padding_mask, time_diffs=time_diffs, training=training)
        out = out * padding_mask[..., None].astype(out.dtype)

        if self.tie_embeddings:
            weight = token_table
            bias = self.param("output_bias", nn.initializers.zeros, (self.vocab_size,)) if self.use_output_bias else None
        else:
            weight = self.param("output_projection", xavier, (self.vocab_size, self.d_model))
            bias = self.param("output_projection_bias", nn.initializers.zeros, (self.vocab_size,)) if self.use_output_bias else None

        if self.score_norm == "l2":
            # norms in f32 (sum-of-squares is cancellation-sensitive)
            out32 = out.astype(jnp.float32)
            out = (out32 / jnp.maximum(jnp.linalg.norm(out32, axis=-1, keepdims=True), self.l2_norm_eps)).astype(out.dtype)
            weight = weight / jnp.maximum(jnp.linalg.norm(weight, axis=-1, keepdims=True), self.l2_norm_eps)

        if return_hidden:
            # For chunked large-vocab CE (ops/chunked_ce.py): hand back the
            # score-normalized hidden states + output table instead of the
            # (B, L, V) logits; the caller folds in self.temperature.
            return {"hidden": out, "weight": weight, "bias": bias}

        logits = jnp.einsum("bld,vd->blv", out, weight.astype(out.dtype)).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias
        if self.temperature != 1.0:
            logits = logits / self.temperature
        return logits
