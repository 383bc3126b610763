"""Loss functions as pure JAX functions.

Parity with ``torch_rechub/basic/loss_func.py`` (RegularizationLoss, HingeLoss,
BPRLoss, NCELoss, InBatchNCELoss) plus the implicit trainer losses (BCE, MSE,
softmax CE).  All binary losses take *logits* and are computed with the stable
log-sigmoid formulation — the reference applies sigmoid in the model and
``BCELoss`` in the trainer (``trainers/ctr_trainer.py:88``), which is
numerically worse; predicted probabilities remain the public API.

Regularization is a pure function of the parameter pytree classified by path
(embedding vs dense, normalization params skipped) instead of the reference's
per-batch ``model.modules()`` walk (``loss_func.py:34-68``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _weighted_mean(loss, weight):
    if weight is None:
        return jnp.mean(loss)
    weight = weight.astype(loss.dtype)
    return jnp.sum(loss * weight) / jnp.maximum(jnp.sum(weight), 1e-12)


def bce_with_logits(logits, targets, weight=None):
    """Binary cross-entropy from logits; `weight` enables pad-batch masking.

    Always computed in f32: under the bf16 mixed-precision policy the model
    emits bf16 logits, but losses/reductions stay full precision.
    """
    logits = logits.reshape(targets.shape).astype(jnp.float32)
    targets = targets.astype(logits.dtype)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _weighted_mean(loss, weight)


def mse_loss(preds, targets, weight=None):
    preds = preds.reshape(targets.shape).astype(jnp.float32)
    return _weighted_mean((preds - targets.astype(preds.dtype)) ** 2, weight)


def softmax_cross_entropy(logits, targets, weight=None):
    """CE over the last axis with integer targets (list-wise matching mode)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _weighted_mean(nll, weight)


def bpr_loss(pos_score, neg_score, weight=None):
    """Bayesian personalized ranking: ``-log sigmoid(pos - neg)``.

    Reference semantics (``loss_func.py:95-107``) plus the sequence case:
    equal-shape pos/neg (e.g. SASRec per-position logits) compare
    element-wise; otherwise a 2-D ``neg`` broadcasts against ``pos[:, None]``.
    ``weight`` is a per-sample (leading-axis) mask.
    """
    pos_score = pos_score.astype(jnp.float32)
    neg_score = neg_score.astype(jnp.float32)
    if pos_score.shape == neg_score.shape:
        diff = pos_score - neg_score
        if weight is not None and diff.ndim > 1:
            weight = jnp.broadcast_to(weight.reshape(weight.shape[0], *([1] * (diff.ndim - 1))), diff.shape)
    else:
        pos_score = pos_score.reshape(-1)
        if neg_score.ndim == 1:
            diff = pos_score - neg_score
        else:
            diff = pos_score[:, None] - neg_score
            if weight is not None:
                weight = jnp.broadcast_to(weight[:, None], diff.shape)
    return _weighted_mean(-jax.nn.log_sigmoid(diff), weight)


def hinge_loss(pos_score, neg_score, margin: float = 2.0, num_items: Optional[int] = None, weight=None):
    """Pairwise hinge loss with optional WARP rank weighting (``loss_func.py:71-92``)."""
    pos_score = pos_score.reshape(-1).astype(jnp.float32)
    neg_score = neg_score.astype(jnp.float32)
    neg_2d = neg_score if neg_score.ndim > 1 else neg_score[:, None]
    loss = jnp.maximum(jnp.max(neg_2d, axis=-1) - pos_score + margin, 0.0)
    if num_items is not None:
        impostors = (neg_2d - pos_score[:, None] + margin) > 0
        rank = jnp.mean(impostors.astype(loss.dtype), axis=-1) * num_items
        loss = loss * jnp.log(rank + 1.0)
    return _weighted_mean(loss, weight)


def nce_loss(logits, targets, temperature: float = 1.0, ignore_index: int = 0, reduction: str = "mean"):
    """Temperature-scaled CE that ignores ``ignore_index`` targets (``loss_func.py:110-177``)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(nll.dtype)
    if reduction == "none":
        return nll * mask
    if reduction == "sum":
        return jnp.sum(nll * mask)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def in_batch_nce_loss(embeddings, item_embeddings, targets, temperature: float = 0.1, ignore_index: int = 0, reduction: str = "mean"):
    """User-vs-all-items NCE (``loss_func.py:180-244``): logits = U @ I.T / t."""
    logits = embeddings @ item_embeddings.T
    return nce_loss(logits, targets, temperature=temperature, ignore_index=ignore_index, reduction=reduction)


# ---------------------------------------------------------------------------
# Regularization over a parameter pytree
# ---------------------------------------------------------------------------

_NORM_MARKERS = ("batchnorm", "layernorm", "groupnorm", "instancenorm", "_norm")
_EMBED_MARKERS = ("embedding", "embed_table", "tables")


def classify_param(path_str: str) -> str:
    """Classify a flax param path as ``'norm' | 'embedding' | 'dense'``.

    Mirrors the reference's partition (``loss_func.py:38-55``): normalization
    parameters are exempt from regularization; embedding tables get the
    embedding coefficients; everything else is dense.
    """
    p = path_str.lower()
    if any(m in p for m in _NORM_MARKERS):
        return "norm"
    if any(m in p for m in _EMBED_MARKERS):
        return "embedding"
    return "dense"


@dataclasses.dataclass(frozen=True)
class RegularizationLoss:
    """L1/L2 regularization with separate embedding vs dense coefficients."""

    embedding_l1: float = 0.0
    embedding_l2: float = 0.0
    dense_l1: float = 0.0
    dense_l2: float = 0.0

    def __bool__(self):
        return any(c > 0 for c in (self.embedding_l1, self.embedding_l2, self.dense_l1, self.dense_l2))

    def __call__(self, params) -> jax.Array:
        total = jnp.asarray(0.0, dtype=jnp.float32)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            kind = classify_param(jax.tree_util.keystr(path))
            if kind == "norm":
                continue
            l1 = self.embedding_l1 if kind == "embedding" else self.dense_l1
            l2 = self.embedding_l2 if kind == "embedding" else self.dense_l2
            if l1 > 0:
                total = total + l1 * jnp.sum(jnp.abs(leaf))
            if l2 > 0:
                total = total + l2 * jnp.sum(leaf**2)
        return total
