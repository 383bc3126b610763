"""HLLM — hierarchical LLM recommender (User-LLM component).

Capability parity with ``torch_rechub/models/generative/hllm.py:12-265``:
frozen pre-computed LLM item embeddings (L2-normalized once, non-trainable),
pre-norm causal transformer blocks with bucketed relative-position bias,
time-bucket embeddings, cosine scoring head ``cos(x, emb)/temperature``.

The frozen embedding table is stored in the ``constants`` variable collection
(never touched by the optimizer — the flax analogue of a torch buffer).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...basic.layers import torch_linear_init
from ...utils.hstu_utils import RelPosBias, bucketize_time
from ...basic.precision import compute_dtype


class HLLMTransformerBlock(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, training: bool = False):
        b, l, d = x.shape
        h = self.n_heads
        head_dim = d // h
        residual = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        dense = lambda name: nn.Dense(d, kernel_init=torch_linear_init, name=name, dtype=compute_dtype())
        q = dense("W_Q")(x).reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)
        k = dense("W_K")(x).reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)
        v = dense("W_V")(x).reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k) * (head_dim**-0.5)
        causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None]
        scores = jnp.where(causal, scores, -jnp.inf)
        if rel_pos_bias is not None:
            scores = scores + jnp.where(causal, rel_pos_bias, 0.0)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v).transpose(0, 2, 1, 3).reshape(b, l, d)
        out = dense("W_O")(out)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        x = residual + out

        residual = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = nn.Dense(4 * d, kernel_init=torch_linear_init, dtype=compute_dtype())(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(d, kernel_init=torch_linear_init, dtype=compute_dtype())(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return residual + x


class HLLMModel(nn.Module):
    item_embeddings: Any  # (vocab_size, d_model) array-like; row 0 = PAD
    vocab_size: int
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 4
    max_seq_len: int = 256
    dropout: float = 0.1
    use_rel_pos_bias: bool = True
    use_time_embedding: bool = True
    num_time_buckets: int = 2048
    time_bucket_fn: str = "sqrt"
    temperature: float = 0.07

    @nn.compact
    def __call__(self, seq_tokens, time_diffs=None, training: bool = False, return_hidden: bool = False):
        emb_np = np.asarray(self.item_embeddings, dtype=np.float32)
        if emb_np.shape[0] != self.vocab_size:
            raise ValueError(f"item_embeddings.shape[0]={emb_np.shape[0]} != vocab_size={self.vocab_size}")
        if emb_np.shape[1] != self.d_model:
            raise ValueError(f"item_embeddings.shape[1]={emb_np.shape[1]} != d_model={self.d_model}")
        normed = emb_np / np.maximum(np.linalg.norm(emb_np, axis=-1, keepdims=True), 1e-8)
        # frozen buffer: lives outside 'params' so the optimizer never sees it
        item_table = self.variable("constants", "item_embeddings", lambda: jnp.asarray(normed)).value

        b, l = seq_tokens.shape
        seq_tokens = seq_tokens.astype(jnp.int32)
        x = jnp.take(item_table, seq_tokens, axis=0)
        xavier = nn.initializers.xavier_uniform()
        pos_table = self.param("position_embedding", xavier, (self.max_seq_len, self.d_model))
        x = x + pos_table[None, :l, :]
        if self.use_time_embedding:
            time_table = self.param("time_embedding", lambda k, s: xavier(k, s).at[0].set(0.0), (self.num_time_buckets + 1, self.d_model))
            td = time_diffs if time_diffs is not None else jnp.zeros((b, l), jnp.int32)
            buckets = jnp.clip(bucketize_time(td, self.num_time_buckets, self.time_bucket_fn, 1.0, "minutes"), 0, self.num_time_buckets - 1)
            x = x + jnp.take(time_table, buckets, axis=0)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)

        rel_bias = RelPosBias(self.n_heads, self.max_seq_len, name="rel_pos_bias")(l) if self.use_rel_pos_bias else None
        for i in range(self.n_layers):
            x = HLLMTransformerBlock(self.d_model, self.n_heads, self.dropout, name=f"block_{i}")(x, rel_bias, training=training)

        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        if return_hidden:
            # For chunked large-vocab CE: cosine-normalized hidden + frozen
            # item table; the caller folds in self.temperature.
            return {"hidden": x, "weight": item_table, "bias": None}
        return jnp.einsum("bld,vd->blv", x, item_table) / self.temperature
