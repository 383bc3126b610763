"""EmbeddingCollection — the shared embedding abstraction.

TPU-native re-design of the reference ``EmbeddingLayer``
(``torch_rechub/basic/layers.py:33-161``): one logical table per feature
group (``shared_with`` resolved at schema level), lookups as XLA gathers
(``jnp.take``) which fuse into the surrounding computation, mask-aware
sum/mean pooling for sequence features, dense passthrough, and the same
``squeeze_dim`` flattening contract.

Table layout (``fused``): ``True`` stores all tables with the same embed_dim
as ONE ``(ΣV, D)`` parameter — a batch's ids for every feature of that width
are gathered in ONE ``jnp.take`` and the backward is a single scatter-add.
Rows are padded to a multiple of 64 so the fused table always row-shards
over the ``model`` mesh axis.  ``False`` keeps one ``(V, D)`` param per
feature group.  ``"auto"`` (the default) fuses only tables with
``vocab_size >= 262144`` rows and keeps the rest per-feature: measured on a
v5e, gathers from small separate tables run 2-3x faster than from one large
fused table (DMA descriptors over a small HBM range; 26xD16 V=10k tables:
0.46 vs 1.16 ms for 106k random rows), while at >=1M rows per table the two
layouts are within 6% and only the fused one can row-shard across chips and
take row-wise sparse updates (``ops/sparse_update.py``).

Padding semantics: torch's ``nn.Embedding(padding_idx=k)`` keeps row ``k`` at
zero by zeroing its gradient.  Here the lookup multiplies the gathered row by
``(ids != padding_idx)`` — identical forward output AND identical gradient
(the padding row never receives gradient), with no mutable state.

Sharding: tables are plain 2-D params; ``parallel.mesh.param_shardings`` row-
shards large tables over the ``model`` mesh axis, and XLA turns the gather
into a masked-local-gather + all-reduce pattern over ICI under jit.
"""

from __future__ import annotations

import zlib
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..basic.features import DenseFeature, Feature, SequenceFeature, SparseFeature, table_name
from ..basic.precision import compute_dtype

# Global default for EmbeddingCollection.fused when the module doesn't choose.
_FUSED_DEFAULT = ["auto"]

# Fused tables pad ΣV up to the NEXT multiple of this (always >= 1 spare row)
# so they row-shard over any model axis that divides 64 (powers of two up to
# 64; a non-power-of-two axis like 3 or 6 need not divide a 64-multiple and
# falls back to replicate with a warning); the spare tail also serves as the
# scratch row for sparse-update dedup fills.  Padded rows are never addressed
# by real ids and receive no gradient.
_FUSED_ROW_MULTIPLE = 64

# "auto" layout: tables at least this many rows join the fused param (they
# need model-axis sharding / sparse updates); smaller ones stay per-feature
# (2-3x faster random gathers, measured on v5e — see module docstring).
_FUSED_AUTO_MIN_ROWS = 262144

# Per-feature tables at least this many rows pad to a multiple of 64 so the
# placement policy (parallel.mesh.plan_table_placement) can row-shard them
# over any model axis that divides 64 (powers of two up to 64).  Keep in sync
# with mesh.SHARD_MIN_ROWS.
_PER_FEATURE_PAD_MIN_ROWS = 65536


def set_fused_default(value):
    """Set the process-wide default table layout; returns the previous value.

    Accepts ``True`` (fuse everything), ``False`` (per-feature tables), or
    ``"auto"`` (fuse only tables with >= ``_FUSED_AUTO_MIN_ROWS`` rows);
    returns the previous value (same ``True | False | "auto"`` domain).
    """
    if value not in (True, False, "auto"):
        raise ValueError(f"fused default must be True, False or 'auto', got {value!r}")
    old = _FUSED_DEFAULT[0]
    _FUSED_DEFAULT[0] = value
    return old


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
    masked_sum = jnp.einsum("bl,bld->bd", mask.astype(emb.dtype), emb)
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
        fused: ``True`` stores same-width tables as one fused ``(ΣV, D)``
            param and batches all their gathers per call; ``False`` keeps one
            param per table; ``"auto"`` fuses only large tables (see module
            docstring).  ``None`` → process default
            (see :func:`set_fused_default`).
    """

    features: Tuple[Feature, ...]
    fused: Optional[object] = None

    def setup(self):
        specs = {}
        for fea in self.features:
            if isinstance(fea, DenseFeature):
                continue
            owner = table_name(fea)
            if getattr(fea, "shared_with", None) is not None or owner in specs:
                continue
            specs[owner] = fea
        self._specs = specs
        mode = self.fused if self.fused is not None else _FUSED_DEFAULT[0]
        if mode not in (True, False, "auto"):
            raise ValueError(f"fused must be True, False or 'auto', got {mode!r}")
        if mode == "auto":
            to_fuse = {o: f for o, f in specs.items() if f.vocab_size >= _FUSED_AUTO_MIN_ROWS}
        elif mode:
            to_fuse = dict(specs)
        else:
            to_fuse = {}
        per_feature = {o: f for o, f in specs.items() if o not in to_fuse}

        tables = {}
        for owner, fea in per_feature.items():
            init = fea.initializer
            # big per-feature tables pad to a 64-row multiple so the placement
            # policy can row-shard them (padded rows: zero, never addressed)
            rows = fea.vocab_size
            if rows >= _PER_FEATURE_PAD_MIN_ROWS:
                rows = -(-rows // _FUSED_ROW_MULTIPLE) * _FUSED_ROW_MULTIPLE

            def init_fn(key, shape, dtype=jnp.float32, _init=init, _fea=fea):
                w = _init(key, (_fea.vocab_size, shape[1]), dtype)
                if _fea.padding_idx is not None:
                    w = w.at[_fea.padding_idx].set(0.0)
                if shape[0] != _fea.vocab_size:
                    w = jnp.concatenate([w, jnp.zeros((shape[0] - _fea.vocab_size, shape[1]), dtype)])
                return w

            tables[owner] = self.param(f"{owner}_table", init_fn, (rows, fea.embed_dim))
        self.tables = tables

        # Fused: group owners by embed_dim, one (ΣV padded, D) param per group.
        groups = {}
        for owner, fea in to_fuse.items():
            groups.setdefault(fea.embed_dim, []).append((owner, fea))
        layout = {}  # owner -> (dim, row_offset)
        fused = {}
        for dim, members in groups.items():
            offset = 0
            offsets = []
            for owner, fea in members:
                layout[owner] = (dim, offset)
                offsets.append(offset)
                offset += fea.vocab_size
            total = offset
            padded = (total // _FUSED_ROW_MULTIPLE + 1) * _FUSED_ROW_MULTIPLE

            def init_fn(key, shape, dtype=jnp.float32, _members=tuple(members), _offsets=tuple(offsets), _total=total):
                w = jnp.zeros(shape, dtype)
                for i, ((owner, fea), off) in enumerate(zip(_members, _offsets)):
                    seg = fea.initializer(jax.random.fold_in(key, i), (fea.vocab_size, shape[1]), dtype)
                    if fea.padding_idx is not None:
                        seg = seg.at[fea.padding_idx].set(0.0)
                    w = jax.lax.dynamic_update_slice(w, seg, (off, 0))
                return w

            fused[dim] = self.param(f"fused_d{dim}_table", init_fn, (padded, dim))
        self.fused_tables = fused
        self._layout = layout

    def table(self, name: str):
        """The full ``(V, D)`` table for one owner feature (a slice if fused
        or row-padded)."""
        if name not in self._layout:
            t = self.tables[name]
            v = self._specs[name].vocab_size
            return t if t.shape[0] == v else jax.lax.slice_in_dim(t, 0, v, axis=0)
        dim, off = self._layout[name]
        return jax.lax.slice_in_dim(self.fused_tables[dim], off, off + self._specs[name].vocab_size, axis=0)

    def _row_offset(self, feature):
        return self._layout[table_name(feature)][1]

    def lookup(self, x, feature):
        """Gather rows for one sparse/sequence feature; padding rows read as 0."""
        ids = x[feature.name].astype(jnp.int32)
        owner = table_name(feature)
        if owner in self._layout:
            dim, off = self._layout[owner]
            emb = jnp.take(self.fused_tables[dim], ids + off, axis=0)
        else:
            emb = jnp.take(self.tables[owner], ids, axis=0)
        if feature.padding_idx is not None:
            emb = emb * (ids != feature.padding_idx)[..., None].astype(emb.dtype)
        return emb.astype(compute_dtype())

    def _fused_batched_embed(self, x, features):
        """One gather per dim-group for all sparse/sequence features.

        Returns ``{feature_index: (B, L?, D) embedding}`` keyed by position in
        ``features``; identical numerics to per-feature :meth:`lookup`.

        Sparse-gradient hooks: the gathered group tensor passes through
        ``nn.perturb`` (a no-op unless a ``perturbations`` collection is
        supplied) and the global row ids are ``sow``n into ``embedding_ids``
        (a no-op unless that collection is mutable).  A sparse-update trainer
        uses ``d loss / d perturbation`` + the sown ids to apply row-wise
        table updates without ever materializing a dense ``(V, D)`` gradient
        (see ``ops/sparse_update.py``).
        """
        by_dim = {}
        for idx, fea in enumerate(features):
            if isinstance(fea, (SparseFeature, SequenceFeature)) and table_name(fea) in self._layout:
                by_dim.setdefault(fea.embed_dim, []).append((idx, fea))
        out = {}
        for dim, items in by_dim.items():
            segs, widths, scalar = [], [], []
            for _, fea in items:
                ids = x[fea.name].astype(jnp.int32)
                scalar.append(ids.ndim == 1)
                ids = ids[:, None] if ids.ndim == 1 else ids
                segs.append(ids + self._row_offset(fea))
                widths.append(ids.shape[1])
            all_ids = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            emb = jnp.take(self.fused_tables[dim], all_ids, axis=0)  # (B, T, D)
            # stable per-call-site tag: dim + crc of the feature-name tuple
            tag = f"d{dim}_{zlib.crc32(';'.join(fea.name for _, fea in items).encode()):08x}"
            # perturb only when creatable or already created: callers may apply
            # with a feature subset unseen at init, whose perturbation var
            # doesn't exist — skipping is the correct zero no-op
            if self.is_mutable_collection("perturbations") or self.has_variable("perturbations", f"demb_{tag}"):
                emb = self.perturb(f"demb_{tag}", emb)
            self.sow("embedding_ids", f"ids_{tag}", all_ids)
            pos = 0
            for (idx, fea), w, was_scalar in zip(items, widths, scalar):
                e = emb[:, pos:pos + w]
                pos += w
                if fea.padding_idx is not None:
                    raw = x[fea.name].astype(jnp.int32)
                    raw = raw[:, None] if raw.ndim == 1 else raw
                    e = e * (raw != fea.padding_idx)[..., None].astype(e.dtype)
                # scalar sparse ids -> (B, D); 2-D ids (e.g. DeepFFM's
                # field-offset trick) keep (B, W, D), matching lookup()
                e = e.astype(compute_dtype())
                out[idx] = e[:, 0] if was_scalar else e
        return out

    def __call__(self, x, features, squeeze_dim: bool = False):
        """Embed + pool a feature list from a dict-of-arrays batch.

        Output contract matches ``EmbeddingLayer.forward``
        (``basic/layers.py:77-127``): ``(B, F, D)`` stacked sparse embeddings,
        or when ``squeeze_dim`` the flat ``(B, ΣD [+ n_dense])`` concat; pure
        dense inputs return ``(B, n_dense)``.
        """
        batched = self._fused_batched_embed(x, features) if self._layout else {}
        sparse_emb, dense_values = [], []
        for idx, fea in enumerate(features):
            if isinstance(fea, SparseFeature):
                e = batched[idx] if idx in batched else self.lookup(x, fea)
                sparse_emb.append(e[:, None, :])
            elif isinstance(fea, SequenceFeature):
                e = batched[idx] if idx in batched else self.lookup(x, fea)
                pooled = pool_sequence(e, feature_mask(x, fea), fea.pooling)
                sparse_emb.append(pooled[:, None, ...])
            elif isinstance(fea, DenseFeature):
                v = x[fea.name].astype(compute_dtype())
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
