"""EmbeddingCollection — the shared embedding abstraction.

TPU-native re-design of the reference ``EmbeddingLayer``
(``torch_rechub/basic/layers.py:33-161``): one logical table per feature
group (``shared_with`` resolved at schema level), lookups as XLA gathers
(``jnp.take``) which fuse into the surrounding computation, mask-aware
sum/mean pooling for sequence features, dense passthrough, and the same
``squeeze_dim`` flattening contract.

Padding semantics: torch's ``nn.Embedding(padding_idx=k)`` keeps row ``k`` at
zero by zeroing its gradient.  Here the lookup multiplies the gathered row by
``(ids != padding_idx)`` — identical forward output AND identical gradient
(the padding row never receives gradient), with no mutable state.

Sharding: tables are plain 2-D params; ``parallel.mesh.param_shardings`` row-
shards large tables over the ``model`` mesh axis, and XLA turns the gather
into an all-gather/all-to-all pattern over ICI automatically under jit.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..basic.features import DenseFeature, Feature, SequenceFeature, SparseFeature, table_name


def feature_mask(x, feature):
    """Float validity mask: positions != padding_idx (or != -1 when unset).

    Same convention as the reference ``InputMask`` (``basic/layers.py:130-161``).
    """
    pad = feature.padding_idx if feature.padding_idx is not None else -1
    return (x[feature.name].astype(jnp.int32) != pad).astype(jnp.float32)


def pool_sequence(emb, mask, pooling: str):
    """Masked pooling over the L axis of ``(B, L, D)`` embeddings.

    ``mean``/``sum`` replicate ``AveragePooling``/``SumPooling``
    (``basic/layers.py:208-251``); ``concat`` keeps ``(B, L, D)``.
    """
    if pooling == "concat":
        return emb
    masked_sum = jnp.einsum("bl,bld->bd", mask, emb)
    if pooling == "sum":
        return masked_sum
    if pooling == "mean":
        return masked_sum / (jnp.sum(mask, axis=-1, keepdims=True) + 1e-16)
    raise ValueError(f"unsupported pooling {pooling!r}")


class EmbeddingCollection(nn.Module):
    """Owns one embedding table per feature group; serves lookups and pooling.

    Attributes:
        features: every feature this collection may serve.  Sparse/sequence
            features without ``shared_with`` own a table; shared features
            resolve to their owner's table.
    """

    features: Tuple[Feature, ...]

    def setup(self):
        tables = {}
        specs = {}
        for fea in self.features:
            if isinstance(fea, DenseFeature):
                continue
            owner = table_name(fea)
            if getattr(fea, "shared_with", None) is not None or owner in specs:
                continue
            specs[owner] = fea
        for owner, fea in specs.items():
            init = fea.initializer

            def init_fn(key, shape, dtype=jnp.float32, _init=init, _fea=fea):
                w = _init(key, shape, dtype)
                if _fea.padding_idx is not None:
                    w = w.at[_fea.padding_idx].set(0.0)
                return w

            tables[owner] = self.param(f"{owner}_table", init_fn, (fea.vocab_size, fea.embed_dim))
        self.tables = tables

    def table(self, name: str):
        return self.tables[name]

    def lookup(self, x, feature):
        """Gather rows for one sparse/sequence feature; padding rows read as 0."""
        ids = x[feature.name].astype(jnp.int32)
        emb = jnp.take(self.tables[table_name(feature)], ids, axis=0)
        if feature.padding_idx is not None:
            emb = emb * (ids != feature.padding_idx)[..., None].astype(emb.dtype)
        return emb

    def __call__(self, x, features, squeeze_dim: bool = False):
        """Embed + pool a feature list from a dict-of-arrays batch.

        Output contract matches ``EmbeddingLayer.forward``
        (``basic/layers.py:77-127``): ``(B, F, D)`` stacked sparse embeddings,
        or when ``squeeze_dim`` the flat ``(B, ΣD [+ n_dense])`` concat; pure
        dense inputs return ``(B, n_dense)``.
        """
        sparse_emb, dense_values = [], []
        for fea in features:
            if isinstance(fea, SparseFeature):
                sparse_emb.append(self.lookup(x, fea)[:, None, :])
            elif isinstance(fea, SequenceFeature):
                pooled = pool_sequence(self.lookup(x, fea), feature_mask(x, fea), fea.pooling)
                sparse_emb.append(pooled[:, None, ...])
            elif isinstance(fea, DenseFeature):
                v = x[fea.name].astype(jnp.float32)
                dense_values.append(v if v.ndim > 1 else v[:, None])
            else:
                raise TypeError(f"unknown feature type: {fea!r}")

        dense_out = jnp.concatenate(dense_values, axis=1) if dense_values else None
        sparse_out = jnp.concatenate(sparse_emb, axis=1) if sparse_emb else None

        if squeeze_dim:
            if sparse_out is None and dense_out is not None:
                return dense_out
            if sparse_out is not None:
                flat = sparse_out.reshape(sparse_out.shape[0], -1)
                if dense_out is not None:
                    return jnp.concatenate([flat, dense_out], axis=1)
                return flat
            raise ValueError("input features cannot be empty")
        if sparse_out is None:
            raise ValueError("non-squeeze output requires sparse/sequence features")
        return sparse_out
