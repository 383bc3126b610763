"""CTRTrainer — single-task binary CTR training.

API parity with ``torch_rechub/trainers/ctr_trainer.py:33-187`` (fit /
evaluate / predict, early stopping on val AUC, StepLR-style per-epoch
schedule, embedding/dense L1/L2 regularization, ``loss_mode=False`` for
models that return ``(y_pred, aux_loss)``), re-designed around one jitted
train step: the loss is BCE-with-logits (models emit logits; probabilities
remain the user-facing output), regularization is a pure function of the
param pytree, and the step is donated so parameter memory is reused in-place.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..basic.callback import EarlyStopper
from ..basic.loss import RegularizationLoss, bce_with_logits
from ..basic.metric import auc_score
from ..basic.tracking import iter_loggers
from ..utils.data import pad_batch
from .base import JaxTrainer, TrainState, apply_updates, to_numpy


class CTRTrainer(JaxTrainer):
    """General single-task trainer.

    Args:
        model: a ranking model (dict input -> logits ``(B,)``).
        optimizer_params: ``{"lr", "weight_decay"}`` (torch-Adam semantics).
        scheduler_params: ``{"step_size", "gamma"}`` StepLR at epoch level.
        n_epoch / earlystop_patience / model_path: as in the reference.
        loss_mode: True -> ``model(x) = logits``; False -> ``(logits, aux_loss)``.
        regularization_params: embedding/dense L1/L2 coefficients.
        mesh: optional ``jax.sharding.Mesh`` for SPMD execution.
    """

    def __init__(self, model, optimizer_params=None, regularization_params=None, scheduler_params=None, n_epoch=10, earlystop_patience=10, loss_mode=True, model_path="./", model_logger=None, mesh=None, seed=0, batch_size_hint=None, steps_per_call=1, sparse_embedding=None, precision=None):
        super().__init__(model, optimizer_params, scheduler_params, n_epoch, earlystop_patience, model_path, mesh, seed, model_logger, precision=precision)
        self.loss_mode = loss_mode
        self.reg_loss_fn = RegularizationLoss(**(regularization_params or {}))
        self.early_stopper = EarlyStopper(patience=earlystop_patience)
        # steps_per_call > 1 runs that many optimizer steps per device
        # dispatch via lax.scan over stacked batches — a device-side training
        # loop that amortizes host->device launch latency (the dominant cost
        # for small models, especially on remote-device transports).
        self.steps_per_call = int(steps_per_call)
        # sparse_embedding: None (dense Adam over everything, reference
        # semantics) | "sgd" | "adagrad" — update ONLY the embedding rows a
        # batch touched; required for production vocab sizes where a dense
        # optimizer pass over the tables dominates (see ops/sparse_update.py).
        from .sparse import validate_method

        self.sparse_embedding = validate_method(sparse_embedding)
        self._train_step = None
        self._train_steps_scan = None
        self._predict_step = None

    # -- jitted steps -------------------------------------------------------
    def _build_steps(self):
        model, loss_mode, reg = self.model, self.loss_mode, self.reg_loss_fn

        def loss_fn(params, batch_stats, x, y, w, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            with self.pscope():
                out, mutated = model.apply(variables, x, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats"])
            aux = 0.0
            if not loss_mode:
                out, aux = out
            loss = bce_with_logits(out, y, w) + aux
            if reg:
                loss = loss + reg(params)
            return loss, mutated.get("batch_stats", batch_stats)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, x, y, w, lr, rng):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, x, y, w, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = apply_updates(state.params, updates, lr)
            return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: TrainState, xs, ys, ws, lr, rng):
            """N optimizer steps in one dispatch: scan over stacked batches."""
            n = ys.shape[0]
            rngs = jax.random.split(rng, n)

            def body(state, batch):
                x, y, w, r = batch
                (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, x, y, w, r)
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                params = apply_updates(state.params, updates, lr)
                return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

            return jax.lax.scan(body, state, (xs, ys, ws, rngs))

        @jax.jit
        def predict_step(params, batch_stats, x):
            with self.pscope():
                out = model.apply({"params": params, "batch_stats": batch_stats}, x, training=False)
            if not loss_mode:
                out = out[0]
            return jax.nn.sigmoid(out.astype(jnp.float32))

        self._train_step, self._train_steps_scan, self._predict_step = train_step, train_steps_scan, predict_step
        if self.sparse_embedding:
            self._build_sparse_steps()

    def _build_sparse_steps(self):
        """Train steps that update embedding-table rows sparsely.

        d loss / d gathered-rows comes from the ``perturbations`` collection,
        touched row ids from the sown ``embedding_ids`` collection (see
        ``ops/embedding.py``); tables are excluded from jax.grad so no dense
        ``(V, D)`` cotangent ever materializes.  Dense params keep the normal
        optax path; tables get SGD / row-wise-Adagrad scatter updates
        (shared machinery: ``trainers/sparse.py``).  Regularization applies
        to dense params only (use the update's ``weight_decay`` for tables).
        """
        from ..ops import sparse_update as su
        from . import sparse as sp

        model, loss_mode, reg = self.model, self.loss_mode, self.reg_loss_fn

        # perturbation shape template (fixed: batches are padded to loader size)
        x0 = {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in self._x0_dev.items()}
        def _pert_shapes(p, b, x):
            with self.pscope():
                return model.apply({"params": p, "batch_stats": b}, x, training=False, mutable=["perturbations"])[1]

        pert_template = sp.pert_template_from(_pert_shapes, self.state.params, self.state.batch_stats, x0)

        def sparse_loss_fn(rest_flat, perts, tables_flat, batch_stats, x, y, w, rng):
            params = su.merge_params(tables_flat, rest_flat)
            variables = {"params": params, "batch_stats": batch_stats, "perturbations": perts}
            with self.pscope():
                out, mutated = model.apply(variables, x, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats", "embedding_ids"])
            aux = 0.0
            if not loss_mode:
                out, aux = out
            loss = bce_with_logits(out, y, w) + aux
            if reg:
                loss = loss + reg(su.merge_params({}, rest_flat))
            return loss, (mutated.get("batch_stats", batch_stats), mutated.get("embedding_ids", {}))

        one_sparse_step = sp.make_sparse_step(self, sparse_loss_fn, pert_template, self.sparse_embedding)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, x, y, w, lr, rng):
            return one_sparse_step(state, (x, y, w, rng), lr)

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state, xs, ys, ws, lr, rng):
            n = ys.shape[0]
            rngs = jax.random.split(rng, n)

            def body(state, batch):
                x, y, w, r = batch
                return one_sparse_step(state, (x, y, w, r), lr)

            return jax.lax.scan(body, state, (xs, ys, ws, rngs))

        self._train_step, self._train_steps_scan = train_step, train_steps_scan

    def _ensure_ready(self, loader):
        if self.state is None:
            x0, _ = loader.first_batch() if loader.y is not None else (loader.first_batch(), None)
            from ..utils.data import pad_batch as _pad

            x0p, _, _ = _pad(x0, None, loader.batch_size)
            self._x0_dev = {k: np.asarray(v) for k, v in x0p.items()}
            self.init_state(x0p)
            if self.sparse_embedding:
                from .sparse import init_sparse_opt_state

                init_sparse_opt_state(self)
        if self._train_step is None:
            self._build_steps()

    # -- public API ---------------------------------------------------------
    def _iter_groups(self, data_loader):
        """Host-side padded batch groups ``(xs, ys, ws)`` stacked to
        ``(n_steps, batch, ...)`` — always stacked (n=1 for single batches) so
        every group flows through the same scan step."""
        batch_size = data_loader.batch_size
        pending = []
        for x, y in data_loader:
            pending.append(pad_batch(x, y, batch_size))
            if len(pending) >= max(1, self.steps_per_call):
                yield self._stack_group(pending)
                pending = []
        if pending:
            yield self._stack_group(pending)

    @staticmethod
    def _stack_group(pending):
        xs = {k: np.stack([b[0][k] for b in pending]) for k in pending[0][0]}
        ys = np.stack([b[1] for b in pending]).astype(np.float32)
        ws = np.stack([b[2] for b in pending]).astype(np.float32)
        return xs, ys, ws

    def train_one_epoch(self, data_loader, log_interval: int = 10, lr: Optional[float] = None) -> float:
        self._ensure_ready(data_loader)
        lr = self.lr0 if lr is None else lr
        lr_dev = jnp.asarray(lr, jnp.float32)
        losses = []
        n_seen = 0
        t0 = time.perf_counter()

        if hasattr(data_loader, "device_groups"):
            groups = data_loader.device_groups()  # already resident in HBM
        else:
            from ..data.dataset import prefetch_to_device
            from ..parallel import mesh as mesh_lib

            sharding = mesh_lib.scan_batch_sharding(self.mesh)
            groups = prefetch_to_device(self._iter_groups(data_loader), size=2, sharding=sharding)
        for gi, (xs, ys, ws) in enumerate(groups):
            self.state, group_losses = self._train_steps_scan(self.state, xs, ys, ws, lr_dev, self.next_dropout_rng())
            losses.append(group_losses)  # device array (n_steps,) — no sync here
            n_seen += int(ys.shape[0]) * int(ys.shape[1])
            self.maybe_step_checkpoint()
            if log_interval and (gi + 1) % log_interval == 0:
                dt = time.perf_counter() - t0
                print(f"  train {n_seen} examples, loss {float(jnp.mean(group_losses)):.5f}, {n_seen / dt:,.0f} ex/s")
        if not losses:
            return 0.0
        return float(np.mean(np.concatenate([to_numpy(l).reshape(-1) for l in losses])))

    def fit(self, train_dataloader, val_dataloader=None, log_interval: int = 10):
        self._ensure_ready(train_dataloader)
        for logger in iter_loggers(self.loggers):
            logger.log_hyperparams({"n_epoch": self.n_epoch, "learning_rate": self.lr0, "loss_mode": self.loss_mode})
        for epoch_i in range(self.n_epoch):
            lr = self.epoch_lr(epoch_i)
            t0 = time.perf_counter()
            train_loss = self.train_one_epoch(train_dataloader, log_interval, lr=lr)
            dt = time.perf_counter() - t0
            print(f"epoch: {epoch_i} train loss: {train_loss:.5f} ({dt:.2f}s, lr={lr:g})")
            for logger in iter_loggers(self.loggers):
                logger.log_metrics({"train/loss": train_loss, "learning_rate": lr}, step=epoch_i)
            if val_dataloader:
                auc = self.evaluate(self.model, val_dataloader)
                print(f"epoch: {epoch_i} validation auc: {auc:.5f}")
                for logger in iter_loggers(self.loggers):
                    logger.log_metrics({"val/auc": auc}, step=epoch_i)
                # snapshot to host: the donated train step reuses device buffers
                if self.early_stopper.stop_training(auc, jax.device_get(self.variables())):
                    print(f"validation: best auc: {self.early_stopper.best_auc}")
                    best = self.early_stopper.best_weights
                    self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
                    break
        if val_dataloader and self.early_stopper.best_weights is not None:
            best = self.early_stopper.best_weights
            self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
        self.save()
        for logger in iter_loggers(self.loggers):
            logger.finish()

    def evaluate(self, model, data_loader, bucketed: bool = False, n_bins: int = 65536) -> float:
        """Validation AUC.

        ``bucketed=False``: exact tie-aware host AUC (reference semantics).
        ``bucketed=True``: device-side histogram AUC — per-batch (pos, neg)
        score histograms accumulate on device (sharded under a mesh) and only
        ONE scalar crosses to the host; within 1e-4 of exact at default bins.
        """
        if not bucketed:
            targets, predicts = self.predict(model, data_loader, return_targets=True)
            return auc_score(targets, predicts)

        from ..basic.metric import auc_from_histogram, auc_histogram

        self._ensure_ready(data_loader)
        batch_size = data_loader.batch_size

        @jax.jit
        def hist_step(params, batch_stats, x, y, w):
            with self.pscope():
                p = model.apply({"params": params, "batch_stats": batch_stats}, x, training=False)
            if not self.loss_mode:
                p = p[0]
            return auc_histogram(y, jax.nn.sigmoid(p.astype(jnp.float32)), n_bins=n_bins, weight=w)

        pos = jnp.zeros((n_bins,), jnp.float32)
        neg = jnp.zeros((n_bins,), jnp.float32)
        for x, y in data_loader:
            x, y, w = pad_batch(x, y, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            p, n = hist_step(self.state.params, self.state.batch_stats, x, jnp.asarray(y, jnp.float32), jnp.asarray(w))
            pos, neg = pos + p, neg + n
        return float(auc_from_histogram(pos, neg))

    def predict(self, model, data_loader, return_targets: bool = False):
        self._ensure_ready(data_loader)
        batch_size = data_loader.batch_size
        preds, targets = [], []
        for batch in data_loader:
            x, y = batch if isinstance(batch, tuple) else (batch, None)
            n = len(next(iter(x.values())))
            x, y, _ = pad_batch(x, y, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            p = to_numpy(self._predict_step(self.state.params, self.state.batch_stats, x)).reshape(-1)[:n]
            preds.append(p)
            if y is not None:
                targets.append(np.asarray(y).reshape(-1)[:n])
        preds = np.concatenate(preds) if preds else np.zeros(0)
        if return_targets:
            return np.concatenate(targets), preds
        return preds
