"""Shared sparse row-wise embedding-update machinery for trainers.

Round-5 factorization of what ``CTRTrainer`` grew in round 3, so
``MatchTrainer`` and ``SeqTrainer`` take ``sparse_embedding=`` too — the
families that actually carry production-size vocabs (matching item towers,
generative token tables; reference Amazon-Books V≈686k,
``/root/reference/examples/generative/run_hstu_amazon_books.py``).

The mechanism (see ``ops/sparse_update.py`` and ``docs/EMBEDDING.md``):
gradients w.r.t. the *gathered rows* come from the ``nn.perturb`` hook,
touched row ids from the sown ``embedding_ids`` collection; the tables are
excluded from ``jax.grad`` so no dense ``(V, D)`` cotangent materializes,
and the updates are scatter ops (SGD bit-equivalent to dense SGD; row-wise
Adagrad with in-batch dedup).  Dense params keep the normal optax path.

Tied-output caveat (SeqTrainer): a model whose OUTPUT projection is the
token table (``tie_embeddings=True``) feeds the table a dense gradient
through the ``(B·L, d) @ (d, V)`` CE logits matmul — every row is touched
every step, so there is nothing sparse to exploit and excluding the table
from ``jax.grad`` would silently drop that output-side gradient.  SeqTrainer
therefore requires ``tie_embeddings=False`` (or an NCE/sampled loss) for
``sparse_embedding`` and raises otherwise.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops import sparse_update as su
from .base import TrainState, apply_updates


def validate_method(method):
    if method not in (None, "sgd", "adagrad"):
        raise ValueError(f"sparse_embedding must be None|'sgd'|'adagrad', got {method!r}")
    return method


def init_sparse_opt_state(trainer, extra_names: Tuple[str, ...] = ()):
    """Restructure ``trainer.state.opt_state`` to ``(dense optax state, accums)``.

    Must run after ``init_state`` and before the first step.  Raises when the
    model has no sparse-capable tables (nothing to update sparsely).
    """
    tables_flat, rest_flat = su.split_fused_tables(trainer.state.params, extra_names)
    if not tables_flat:
        raise ValueError(
            "sparse_embedding found no sparse-capable tables in this model "
            f"(looked for fused 'fused_d*_table' params and named tables {list(extra_names)}). "
            "For EmbeddingCollection models the default 'auto' layout only fuses tables with "
            ">=262144 rows — call ops.embedding.set_fused_default(True) before building the model "
            "to fuse everything; models without an addressable vocab table (e.g. HLLM's frozen "
            "item embeddings) cannot take sparse updates."
        )
    opt_state = (trainer.tx.init(rest_flat), su.init_accumulators(tables_flat))
    trainer.state = trainer.state.replace(opt_state=opt_state)


def apply_sparse_table_updates(tables_flat, accums, g_pert, ids_tree, method, lr, spare_rows=None):
    """Group perturbation grads by owning table and apply scatter updates.

    Shared by :func:`make_sparse_step` and MTLTrainer's custom sparse step
    (which carries extra state the generic TrainState can't).  Returns the
    updated ``(tables_flat, accums)``.
    """
    spare_rows = spare_rows or {}
    by_table = {}
    for tkey, fids, fgrads in su.pair_sparse_grads(g_pert, ids_tree):
        by_table.setdefault(tkey, []).append((fids, fgrads))
    accums = dict(accums)
    for tkey, parts in by_table.items():
        fids = jnp.concatenate([p[0] for p in parts])
        fgrads = jnp.concatenate([p[1] for p in parts])
        if method == "sgd":
            tables_flat[tkey] = su.sparse_sgd_update(tables_flat[tkey], fids, fgrads, lr)
        else:
            tables_flat[tkey], accums[tkey] = su.rowwise_adagrad_update(tables_flat[tkey], accums[tkey], fids, fgrads, lr, spare_row=spare_rows.get(tkey[-1], -1))
    return tables_flat, accums


def pert_template_from(apply_shapes_fn, *args):
    """``eval_shape`` the perturbations collection for an apply signature.

    ``apply_shapes_fn(*args)`` must run the model apply with
    ``mutable=["perturbations"]`` and return the mutated-variables dict.
    """
    var_shapes = jax.eval_shape(apply_shapes_fn, *args)
    return var_shapes.get("perturbations", {})


def make_sparse_step(trainer, loss_fn: Callable, pert_template, method: str, extra_names: Tuple[str, ...] = (), spare_rows=None):
    """Build the generic one-step sparse update around a trainer loss.

    Args:
        loss_fn: ``(rest_flat, perts, tables_flat, batch_stats, *batch) ->
            (loss, (new_batch_stats, ids_tree))`` — diff'd w.r.t. args 0, 1.
        pert_template: shape template for the perturbations collection.
        method: ``"sgd"`` | ``"adagrad"``.
        spare_rows: optional ``{table leaf name: row}`` — the Adagrad dedup
            fill target per NAMED table.  Fused tables default to their padded
            spare tail row; a named unpadded table must designate a row whose
            updates are provably zero (e.g. HSTU's PAD row 0, whose embedding
            is masked out of the forward), because ids equal to the fill row
            are treated as fill slots.

    Returns ``one_step(state, batch_tuple, lr) -> (new_state, loss)`` suitable
    for wrapping in jit / lax.scan by the concrete trainer.
    """
    spare_rows = spare_rows or {}

    def one_step(state: TrainState, batch, lr):
        tables_flat, rest_flat = su.split_fused_tables(state.params, extra_names)
        opt_state, accums = state.opt_state
        # a callable template adapts to the batch shape at trace time
        # (variable-length tail batches recompile with matching pert shapes)
        tmpl = pert_template(state, batch) if callable(pert_template) else pert_template
        perts = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), tmpl)
        ((loss, (new_bs, ids_tree)), (g_rest, g_pert)) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(rest_flat, perts, tables_flat, state.batch_stats, *batch)
        updates, opt_state = trainer.tx.update(g_rest, opt_state, rest_flat)
        rest_flat = apply_updates(rest_flat, updates, lr)
        tables_flat, accums = apply_sparse_table_updates(tables_flat, accums, g_pert, ids_tree, method, lr, spare_rows)
        params = su.merge_params(tables_flat, rest_flat)
        return TrainState(params=params, batch_stats=new_bs, opt_state=(opt_state, accums), step=state.step + 1), loss

    return one_step
