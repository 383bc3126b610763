"""Multi-task learning helpers: shared/task parameter split, MetaBalance, GradNorm.

Functional re-design of ``torch_rechub/utils/mtl.py``:

- ``shared_task_mask``: the reference splits parameters by hard-coded module
  attribute lists per model class (``utils/mtl.py:7-37``); here the split is a
  boolean pytree derived from parameter *paths* (embedding/bottom/expert/cgc
  are shared; tower/gate/ait/info are task-specific) — model-agnostic and
  jit-friendly.
- ``metabalance_scale``: the optimizer's moving-average gradient-norm scaling
  (``utils/mtl.py:40-100``) as a pure function over per-task gradient pytrees
  + a norms-state pytree; no mutable optimizer state.
- ``gradnorm_weight_grads``: GradNorm's loss-weight gradient
  (``utils/mtl.py:103-136``) computed analytically from per-task shared-layer
  gradient norms.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

_SHARED_MARKERS = ("embedding", "bottom", "expert", "cgc")
_TASK_MARKERS = ("tower", "gate", "ait", "predict", "info")


def is_shared_path(path_str: str) -> bool:
    p = path_str.lower()
    if any(m in p for m in _TASK_MARKERS):
        return False
    return True  # embedding/bottom/experts/cgc and anything unmatched default to shared


def shared_task_mask(params):
    """Boolean pytree: True = shared parameter, False = task-specific."""
    return jax.tree_util.tree_map_with_path(lambda path, _: is_shared_path(jax.tree_util.keystr(path)), params)


def metabalance_scale(grads_list: List, norms_state, relax_factor: float = 0.7, beta: float = 0.9):
    """Scale auxiliary-task gradients toward task-0's norm; return (summed, new_norms).

    For every parameter leaf: ``norms[t] = beta*norms[t] + (1-beta)*||g_t||``;
    ``g_t <- g_t * (norms[0]/(norms[t]+1e-5)) * relax + g_t * (1-relax)``;
    output gradient = sum over tasks (reference semantics per leaf).

    ``norms_state`` is a tuple of ``(n_task,)`` arrays aligned with
    ``jax.tree_util.tree_leaves(grads)`` order (or None on the first step).
    """
    n_task = len(grads_list)
    leaves0, treedef = jax.tree_util.tree_flatten(grads_list[0])
    grads_leaves = [jax.tree_util.tree_leaves(g) for g in grads_list]

    new_norms, summed = [], []
    for li in range(len(leaves0)):
        g_ts = [grads_leaves[t][li] for t in range(n_task)]
        old = norms_state[li] if norms_state is not None else jnp.zeros((n_task,), jnp.float32)
        cur = jnp.stack([jnp.linalg.norm(g.reshape(-1)) for g in g_ts])
        upd = old * beta + (1 - beta) * cur
        scale = upd[0] / (upd + 1e-5) * relax_factor + (1.0 - relax_factor)
        total = sum(g * scale[t] for t, g in enumerate(g_ts))
        new_norms.append(upd)
        summed.append(total)
    return jax.tree_util.tree_unflatten(treedef, summed), tuple(new_norms)


def gradnorm_weight_grads(shared_grad_norms: jnp.ndarray, loss_weight: jnp.ndarray, loss_vals: jnp.ndarray, initial_task_loss: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """d(GradNorm loss)/d(w): norms_i = w_i*||g_i||, target = mean_norm * r^alpha."""

    def gn_loss(w):
        norms = w * shared_grad_norms
        mean_norm = jax.lax.stop_gradient(jnp.mean(norms))
        loss_ratio = loss_vals / jnp.maximum(initial_task_loss, 1e-12)
        constant = mean_norm * (jnp.mean(loss_ratio) ** alpha)
        return jnp.sum(jnp.abs(norms - constant))

    return jax.grad(gn_loss)(loss_weight)
