"""SeqTrainer — autoregressive sequence-model training (HSTU / HLLM).

API parity with ``torch_rechub/trainers/seq_trainer.py``: batches are
``(seq_tokens, seq_positions, seq_time_diffs, targets)``; full-sequence
next-token CE with shifted labels ``concat(seq[1:], target)``, PAD positions
masked on the *current* token and the PAD logit clamped to -1e9; loss =
cross-entropy or temperature NCE; ``evaluate`` returns (avg loss, top-1 hit
on the held-out target).  One jitted, donated train step.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..basic.callback import EarlyStopper
from ..basic.tracking import iter_loggers
from ..ops.chunked_ce import chunked_last_logits, chunked_next_token_loss, sampled_next_token_loss
from .base import JaxTrainer, TrainState, apply_updates, to_numpy


def next_token_loss(logits, seq_tokens, targets, temperature: float = 1.0, ignore_index: int = 0):
    """Shifted next-token CE (reference ``seq_trainer.py:169-187`` semantics)."""
    next_tokens = jnp.concatenate([seq_tokens[:, 1:], targets[:, None]], axis=1)
    next_tokens = jnp.where(seq_tokens == 0, 0, next_tokens)
    logits = logits.astype(jnp.float32).at[..., 0].set(-1e9)
    log_probs = jax.nn.log_softmax(logits / temperature, axis=-1)
    nll = -jnp.take_along_axis(log_probs, next_tokens[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (next_tokens != ignore_index).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class SeqTrainer(JaxTrainer):
    def __init__(self, model, optimizer_params=None, scheduler_params=None, n_epoch=10, earlystop_patience=10, model_path="./", loss_type="cross_entropy", loss_params=None, model_logger=None, mesh=None, seed=0, vocab_chunk_size=None, steps_per_call=1, sparse_embedding=None, precision=None):
        super().__init__(model, optimizer_params, scheduler_params, n_epoch, earlystop_patience, model_path, mesh, seed, model_logger, precision=precision)
        # sparse_embedding: None | "sgd" | "adagrad" — row-wise updates of the
        # INPUT token table.  Requires an untied model (tie_embeddings=False):
        # a tied table receives a DENSE gradient through the (B*L, d) @ (d, V)
        # CE logits matmul (every vocab row, every step), so there is nothing
        # sparse to exploit and excluding it from jax.grad would drop the
        # output-side gradient (see trainers/sparse.py docstring).
        from .sparse import validate_method

        self.sparse_embedding = validate_method(sparse_embedding)
        if self.sparse_embedding and getattr(model, "tie_embeddings", False):
            raise ValueError(
                "SeqTrainer(sparse_embedding=...) requires an untied output projection "
                "(tie_embeddings=False): with tied embeddings the token table gets a dense "
                "gradient through the CE logits matmul, so sparse row-wise updates would "
                "silently drop it. Untie the model (or use the dense path for tied models)."
            )
        if loss_type not in ("cross_entropy", "nce", "sampled_softmax"):
            raise ValueError(f"loss_type must be cross_entropy|nce|sampled_softmax, got {loss_type!r}")
        self.loss_type = loss_type
        if loss_type == "nce":
            self.loss_params = loss_params or {"temperature": 0.1, "ignore_index": 0}
        elif loss_type == "sampled_softmax":
            # O(num_negatives) output cost instead of O(V) — the production
            # choice at Amazon-Books-scale vocabs (ops/chunked_ce.py)
            self.loss_params = {"num_negatives": 1024, "ignore_index": 0, **(loss_params or {})}
        else:
            self.loss_params = loss_params or {"ignore_index": 0}
        # When set, the (B, L, V) logits tensor is never materialized: the
        # model returns hidden states (return_hidden=True) and the CE is
        # accumulated over vocab chunks of this size (ops/chunked_ce.py).
        self.vocab_chunk_size = vocab_chunk_size
        # device-side loop: run N optimizer steps per dispatch via lax.scan
        # (launch-latency amortization, see CTRTrainer.steps_per_call)
        self.steps_per_call = int(steps_per_call)
        self.early_stopper = EarlyStopper(patience=earlystop_patience)
        self._train_step = None
        self._train_steps_scan = None
        self._eval_step = None

    def _build_steps(self):
        model = self.model
        temperature = float(self.loss_params.get("temperature", 1.0)) if self.loss_type == "nce" else 1.0
        ignore_index = int(self.loss_params.get("ignore_index", 0))
        chunk = self.vocab_chunk_size
        # The dense path applies the model's own temperature inside apply();
        # the chunked path gets raw hidden/table, so fold it in here.
        chunked_t = temperature * float(getattr(model, "temperature", 1.0))

        consts = self.const_vars

        sampled = self.loss_type == "sampled_softmax"
        num_negatives = int(self.loss_params.get("num_negatives", 1024)) if sampled else 0
        # sampled-softmax knobs: loss-level temperature multiplies the model's
        # own (like the NCE path); hit-masking/logQ default on
        sampled_t = float(self.loss_params.get("temperature", 1.0)) * float(getattr(model, "temperature", 1.0))
        rm_hits = bool(self.loss_params.get("remove_accidental_hits", True))
        logq = bool(self.loss_params.get("logq_correction", True))

        def loss_fn(params, batch_stats, seq_tokens, time_diffs, targets, rng):
            variables = {"params": params, "batch_stats": batch_stats, **consts}
            if sampled:
                with self.pscope():
                    out, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, return_hidden=True, rngs={"dropout": rng}, mutable=["batch_stats"])
                    loss = sampled_next_token_loss(out["hidden"], out["weight"], seq_tokens, targets, jax.random.fold_in(rng, 0x5A), out["bias"], sampled_t, ignore_index, num_negatives, rm_hits, logq)
                return loss, mutated.get("batch_stats", batch_stats)
            if chunk is not None:
                with self.pscope():
                    out, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, return_hidden=True, rngs={"dropout": rng}, mutable=["batch_stats"])
                    loss = chunked_next_token_loss(out["hidden"], out["weight"], seq_tokens, targets, out["bias"], chunked_t, ignore_index, chunk)
                return loss, mutated.get("batch_stats", batch_stats)
            with self.pscope():
                logits, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = next_token_loss(logits, seq_tokens, targets, temperature, ignore_index)
            return loss, mutated.get("batch_stats", batch_stats)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, seq_tokens, time_diffs, targets, lr, rng):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, seq_tokens, time_diffs, targets, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = apply_updates(state.params, updates, lr)
            return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: TrainState, toks, tds, tgts, lr, rng):
            """N optimizer steps in one dispatch (stacked (N, B, L) batches)."""
            rngs = jax.random.split(rng, tgts.shape[0])

            def body(state, batch):
                seq_tokens, time_diffs, targets, r = batch
                (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, seq_tokens, time_diffs, targets, r)
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                params = apply_updates(state.params, updates, lr)
                return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

            return jax.lax.scan(body, state, (toks, tds, tgts, rngs))

        # evaluation always scores the FULL vocab (exact loss + top-1); the
        # sampled-softmax TRAIN loss therefore defaults to chunked eval so a
        # (B, L, V) logits tensor never materializes at production vocabs
        eval_chunk = chunk if chunk is not None else (8192 if sampled else None)

        @jax.jit
        def eval_step(params, batch_stats, seq_tokens, time_diffs, targets):
            variables = {"params": params, "batch_stats": batch_stats, **consts}
            if eval_chunk is not None:
                with self.pscope():
                    out = model.apply(variables, seq_tokens, time_diffs, training=False, return_hidden=True)
                    loss = chunked_next_token_loss(out["hidden"], out["weight"], seq_tokens, targets, out["bias"], chunked_t, ignore_index, eval_chunk)
                    last = chunked_last_logits(out["hidden"][:, -1, :], out["weight"], out["bias"], chunked_t)
                last = last.astype(jnp.float32).at[:, ignore_index].set(-1e9)
                return loss, jnp.argmax(last, axis=-1)
            with self.pscope():
                logits = model.apply(variables, seq_tokens, time_diffs, training=False)
            loss = next_token_loss(logits, seq_tokens, targets, temperature, ignore_index)
            last = logits[:, -1, :].at[:, 0].set(-1e9)
            preds = jnp.argmax(last, axis=-1)
            return loss, preds

        self._train_step, self._train_steps_scan, self._eval_step = train_step, train_steps_scan, eval_step
        if self.sparse_embedding:
            self._build_sparse_steps()

    def _build_sparse_steps(self):
        """Row-wise sparse updates of the input token table (untied models).

        The output projection (and its dense CE gradient) stays on the optax
        path; only the input-side gather gradient — genuinely sparse, B*L
        touched rows of a V-row table — is applied as a scatter update.  The
        Adagrad dedup fill row is the PAD row 0, whose embedding is masked
        out of the forward so its update is provably zero.
        """
        from ..ops import sparse_update as su
        from . import sparse as sp

        model = self.model
        temperature = float(self.loss_params.get("temperature", 1.0)) if self.loss_type == "nce" else 1.0
        ignore_index = int(self.loss_params.get("ignore_index", 0))
        chunk = self.vocab_chunk_size
        chunked_t = temperature * float(getattr(model, "temperature", 1.0))
        consts = self.const_vars

        def pert_template(state, batch):
            # trace-time template matching THIS batch's (B, L) — tail batches
            # recompile with correct perturbation shapes
            seq_tokens, time_diffs = batch[0], batch[1]

            def _pert_shapes(p, b, toks, tds):
                with self.pscope():
                    return model.apply({"params": p, "batch_stats": b, **consts}, toks, tds, training=False, mutable=["perturbations"])[1]

            tmpl = dict(sp.pert_template_from(
                _pert_shapes, state.params, state.batch_stats,
                jax.ShapeDtypeStruct(seq_tokens.shape, jnp.int32),
                jax.ShapeDtypeStruct(time_diffs.shape, jnp.int32),
            ))
            if sampled:
                bsz, l = seq_tokens.shape
                d = int(model.d_model)
                tmpl["demb_named_output_projection__pos"] = jax.ShapeDtypeStruct((bsz, l, d), jnp.float32)
                tmpl["demb_named_output_projection__neg"] = jax.ShapeDtypeStruct((num_negatives, d), jnp.float32)
            return tmpl

        sampled = self.loss_type == "sampled_softmax"
        num_negatives = int(self.loss_params.get("num_negatives", 1024)) if sampled else 0
        sampled_t = float(self.loss_params.get("temperature", 1.0)) * float(getattr(model, "temperature", 1.0))
        rm_hits = bool(self.loss_params.get("remove_accidental_hits", True))
        logq = bool(self.loss_params.get("logq_correction", True))
        vocab = int(getattr(model, "vocab_size", 0))
        # score_norm="l2" models normalize hidden AND weight rows; the raw
        # gathered rows must get the same normalization (the perturbation
        # gradient then includes the normalization Jacobian, matching dense)
        l2_rows = getattr(model, "score_norm", "none") == "l2"
        l2_eps = float(getattr(model, "l2_norm_eps", 1e-6))

        def sparse_loss_fn(rest_flat, perts, tables_flat, batch_stats, seq_tokens, time_diffs, targets, rng):
            params = su.merge_params(tables_flat, rest_flat)
            variables = {"params": params, "batch_stats": batch_stats, "perturbations": perts, **consts}
            with self.pscope():
                if sampled:
                    # the OUTPUT table is sparse here too: only the candidate
                    # rows (targets + shared negatives) are gathered, with
                    # trainer-level perturbations standing in for row grads —
                    # no dense (V, d) cotangent, no dense Adam moments
                    out, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, return_hidden=True, rngs={"dropout": rng}, mutable=["batch_stats", "embedding_ids"])
                    from ..ops.chunked_ce import sampled_candidates, sampled_loss_from_rows

                    table = tables_flat[("output_projection",)]
                    next_tokens, negs = sampled_candidates(seq_tokens, targets, jax.random.fold_in(rng, 0x5A), vocab, num_negatives, ignore_index)
                    w_pos = jnp.take(table, next_tokens, axis=0) + perts["demb_named_output_projection__pos"]
                    w_neg = jnp.take(table, negs, axis=0) + perts["demb_named_output_projection__neg"]
                    if l2_rows:
                        w_pos = w_pos / jnp.maximum(jnp.linalg.norm(w_pos, axis=-1, keepdims=True), l2_eps)
                        w_neg = w_neg / jnp.maximum(jnp.linalg.norm(w_neg, axis=-1, keepdims=True), l2_eps)
                    bias = out["bias"]
                    b_pos = bias[next_tokens] if bias is not None else None
                    b_neg = bias[negs] if bias is not None else None
                    loss = sampled_loss_from_rows(out["hidden"], w_pos, w_neg, b_pos, b_neg, next_tokens, negs, vocab, sampled_t, ignore_index, rm_hits, logq)
                    ids_tree = {**mutated.get("embedding_ids", {}), "ids_named_output_projection__pos": next_tokens, "ids_named_output_projection__neg": negs}
                    return loss, (mutated.get("batch_stats", batch_stats), ids_tree)
                elif chunk is not None:
                    out, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, return_hidden=True, rngs={"dropout": rng}, mutable=["batch_stats", "embedding_ids"])
                    loss = chunked_next_token_loss(out["hidden"], out["weight"], seq_tokens, targets, out["bias"], chunked_t, ignore_index, chunk)
                else:
                    logits, mutated = model.apply(variables, seq_tokens, time_diffs, training=True, rngs={"dropout": rng}, mutable=["batch_stats", "embedding_ids"])
                    loss = next_token_loss(logits, seq_tokens, targets, temperature, ignore_index)
            return loss, (mutated.get("batch_stats", batch_stats), mutated.get("embedding_ids", {}))

        one_sparse_step = sp.make_sparse_step(self, sparse_loss_fn, pert_template, self.sparse_embedding, extra_names=self._sparse_extra_names(), spare_rows={"token_embedding": 0, "output_projection": 0})

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, seq_tokens, time_diffs, targets, lr, rng):
            return one_sparse_step(state, (seq_tokens, time_diffs, targets, rng), lr)

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state, toks, tds, tgts, lr, rng):
            rngs = jax.random.split(rng, tgts.shape[0])

            def body(state, batch):
                seq_tokens, time_diffs, targets, r = batch
                return one_sparse_step(state, (seq_tokens, time_diffs, targets, r), lr)

            return jax.lax.scan(body, state, (toks, tds, tgts, rngs))

        self._train_step, self._train_steps_scan = train_step, train_steps_scan

    def init_state_from_batch(self, batch):
        seq_tokens, _pos, time_diffs, _targets = batch
        init_rng, self._rng = jax.random.split(self._rng)
        def _init(rngs, toks, tds):
            with self.pscope():
                return self.model.init(rngs, toks, tds, training=False)

        init_fn = jax.jit(_init)
        variables = init_fn({"params": init_rng, "dropout": init_rng}, jnp.asarray(seq_tokens), jnp.asarray(time_diffs))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # perturbations/embedding_ids are per-batch transients created by the
        # sparse-gradient hooks during init — never constants to re-feed
        self.const_vars = {k: v for k, v in variables.items() if k not in ("params", "batch_stats", "perturbations", "embedding_ids", "intermediates")}
        if self.mesh is not None:
            # SPMD placement: the token/output vocab table row-shards over the
            # model axis (when >= mesh.SHARD_MIN_ROWS), so the chunked-CE
            # logits matmul runs vocab-sharded (SURVEY.md:558-561 plan);
            # everything else replicates.
            from ..parallel import mesh as mesh_lib

            params = mesh_lib.shard_params(params, self.mesh)
            batch_stats = jax.tree_util.tree_map(lambda a: jax.device_put(a, mesh_lib.replicated_sharding(self.mesh)), batch_stats)
        opt_state = self.tx.init(params)
        from .base import TrainState as TS

        self.state = TS(params=params, batch_stats=batch_stats, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        return self.state

    def _sparse_extra_names(self):
        """Named tables the sparse path owns: the input token table always;
        the output projection too under sampled softmax (only candidate rows
        are touched there — dense CE would touch every row)."""
        if self.loss_type == "sampled_softmax":
            return ("token_embedding", "output_projection")
        return ("token_embedding",)

    def _ensure_ready(self, loader):
        if self.state is None:
            self.init_state_from_batch(next(iter(loader)))
            if self.sparse_embedding:
                from .sparse import init_sparse_opt_state

                init_sparse_opt_state(self, extra_names=self._sparse_extra_names())
        if self._train_step is None:
            self._build_steps()

    def _iter_groups(self, data_loader):
        """Yield stacked ``(n, B, ...)`` groups of full-size batches and plain
        ``(B, ...)`` odd-size tail batches (told apart by tokens.ndim),
        preserving step order."""
        batch_size = getattr(data_loader, "batch_size", None)
        pending = []

        def stacked():
            return tuple(np.stack([b[i] for b in pending]) for i in range(3))

        for seq_tokens, _pos, time_diffs, targets in data_loader:
            batch = (np.asarray(seq_tokens), np.asarray(time_diffs), np.asarray(targets).reshape(-1))
            if self.steps_per_call > 1 and (batch_size is None or len(batch[2]) == batch_size):
                pending.append(batch)
                if len(pending) >= self.steps_per_call:
                    yield stacked()
                    pending = []
            else:
                if pending:
                    yield stacked()
                    pending = []
                yield batch
        if pending:
            yield stacked()

    def train_one_epoch(self, data_loader, log_interval: int = 10, lr: Optional[float] = None) -> float:
        self._ensure_ready(data_loader)
        lr = self.lr0 if lr is None else lr
        lr_dev = jnp.asarray(lr, jnp.float32)
        losses = []
        n_seen = 0
        t0 = time.perf_counter()

        from ..data.dataset import prefetch_to_device
        from ..parallel import mesh as mesh_lib

        # stacked groups are (n, B, ...): scan axis replicated, batch over
        # `data`; odd tail batches are (B, ...) and re-placed per ndim below
        sharding = mesh_lib.scan_batch_sharding(self.mesh)
        batch_sharding = mesh_lib.batch_sharding(self.mesh)
        groups = self._iter_groups(data_loader)
        if sharding is None:
            groups = prefetch_to_device(groups, size=2)
        for gi, (toks, tds, tgts) in enumerate(groups):
            if sharding is not None:
                sh = sharding if np.asarray(toks).ndim == 3 else batch_sharding
                toks, tds, tgts = (jax.device_put(jnp.asarray(a), sh) for a in (toks, tds, tgts))
            if toks.ndim == 3:  # stacked (n, B, L) scan group
                self.state, group = self._train_steps_scan(self.state, toks, tds, tgts, lr_dev, self.next_dropout_rng())
                losses.append(group)
                n_seen += int(tgts.shape[0]) * int(tgts.shape[1])
            else:
                self.state, loss = self._train_step(self.state, toks, tds, tgts, lr_dev, self.next_dropout_rng())
                losses.append(loss.reshape(1))
                n_seen += int(tgts.shape[0])
            if log_interval and (gi + 1) % log_interval == 0:
                dt = time.perf_counter() - t0
                print(f"  train {n_seen} sequences, loss {float(jnp.mean(losses[-1])):.5f}, {n_seen / dt:,.0f} seq/s")
        return float(np.mean(np.concatenate([to_numpy(l).reshape(-1) for l in losses]))) if losses else 0.0

    def fit(self, train_dataloader, val_dataloader=None):
        self._ensure_ready(train_dataloader)
        for logger in iter_loggers(self.loggers):
            logger.log_hyperparams({"n_epoch": self.n_epoch, "learning_rate": self.lr0, "loss_type": self.loss_type})
        for epoch_i in range(self.n_epoch):
            lr = self.epoch_lr(epoch_i)
            t0 = time.perf_counter()
            train_loss = self.train_one_epoch(train_dataloader, lr=lr)
            print(f"epoch: {epoch_i} train loss: {train_loss:.5f} ({time.perf_counter()-t0:.2f}s)")
            for logger in iter_loggers(self.loggers):
                logger.log_metrics({"train/loss": train_loss, "learning_rate": lr}, step=epoch_i)
            if val_dataloader is not None:
                val_loss, accuracy = self.evaluate(val_dataloader)
                print(f"epoch: {epoch_i} val loss: {val_loss:.5f} top1 acc: {accuracy:.5f}")
                for logger in iter_loggers(self.loggers):
                    logger.log_metrics({"val/loss": val_loss, "val/top1_acc": accuracy}, step=epoch_i)
                if self.early_stopper.stop_training(accuracy, jax.device_get(self.variables())):
                    print(f"validation: best top1 acc: {self.early_stopper.best_auc}")
                    best = self.early_stopper.best_weights
                    self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
                    break
        if val_dataloader is not None and self.early_stopper.best_weights is not None:
            best = self.early_stopper.best_weights
            self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
        self.save()
        for logger in iter_loggers(self.loggers):
            logger.finish()

    def evaluate(self, data_loader):
        self._ensure_ready(data_loader)
        total_loss, total_correct, total = 0.0, 0, 0
        n_batches = 0
        for seq_tokens, _pos, time_diffs, targets in data_loader:
            targets = np.asarray(targets).reshape(-1)
            loss, preds = self._eval_step(self.state.params, self.state.batch_stats, jnp.asarray(np.asarray(seq_tokens)), jnp.asarray(np.asarray(time_diffs)), jnp.asarray(targets))
            total_loss += float(to_numpy(loss))
            total_correct += int(np.sum(to_numpy(preds) == targets))
            total += len(targets)
            n_batches += 1
        return total_loss / max(n_batches, 1), total_correct / max(total, 1)

    def predict_logits(self, data_loader):
        """Stream last-position logits for ranking-style evaluation."""
        self._ensure_ready(data_loader)
        out = []
        for seq_tokens, _pos, time_diffs, targets in data_loader:
            logits = self.model.apply(self.variables(), jnp.asarray(np.asarray(seq_tokens)), jnp.asarray(np.asarray(time_diffs)), training=False)
            out.append(to_numpy(logits[:, -1, :]))
        return np.concatenate(out)
