"""MatchTrainer — two-tower retrieval training.

API parity with ``torch_rechub/trainers/match_trainer.py:33-339``: three
training modes (0 point-wise BCE, 1 pair-wise BPR, 2 list-wise CE), optional
in-batch negative sampling (uniform or hard top-k), ``inference_embedding``
for streaming tower embeddings from the best checkpoint, fit/evaluate/predict
with early stopping.

TPU design: one jitted donated train step per mode; the in-batch path
computes the ``(B, B)`` score matrix, samples negatives with a vectorized
random-top-k, and gathers logits entirely on device.  Matching models emit
raw scores (no sigmoid); losses are computed from logits.

Negative-pool scope under a mesh (``neg_pool``): with the batch sharded over
the data axis, the default ``"global"`` pool scores every user against the
FULL global batch — XLA inserts the item-tower all-gather — which upgrades
the reference's per-DDP-process pool (``match_trainer.py:118-138``).
``neg_pool="local"`` restores per-process semantics via ``shard_map``: each
data shard samples only its own ``(b, b)`` block, trading pool size for zero
item all-gather traffic on the ICI (see ``utils.match.local_inbatch_loss``).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..basic.callback import EarlyStopper
from ..basic.loss import RegularizationLoss, bce_with_logits, bpr_loss, softmax_cross_entropy
from ..basic.metric import auc_score
from ..basic.tracking import iter_loggers
from ..utils.data import pad_batch
from ..utils.match import gather_inbatch_logits, inbatch_negative_sampling, local_inbatch_loss
from .base import JaxTrainer, TrainState, apply_updates, load_checkpoint, to_numpy


class MatchTrainer(JaxTrainer):
    """General matching/retrieval trainer (modes 0/1/2 + in-batch negatives)."""

    def __init__(self, model, mode=0, in_batch_neg=False, in_batch_neg_ratio=None, hard_negative=False, neg_pool="global", sampler_seed=None, optimizer_params=None, regularization_params=None, scheduler_params=None, n_epoch=10, earlystop_patience=10, model_path="./", model_logger=None, mesh=None, seed=0, steps_per_call=1, sparse_embedding=None, precision=None):
        super().__init__(model, optimizer_params, scheduler_params, n_epoch, earlystop_patience, model_path, mesh, seed, model_logger, precision=precision)
        if mode not in (0, 1, 2):
            raise ValueError(f"mode only contain value in [0, 1, 2], but got {mode}")
        if neg_pool not in ("global", "local"):
            raise ValueError(f"neg_pool must be 'global' or 'local', got {neg_pool!r}")
        # sparse_embedding: None | "sgd" | "adagrad" — row-wise updates of the
        # fused feature tables (user/item towers have genuinely sparse grads;
        # see trainers/sparse.py).  Dense params keep the optax path.
        from .sparse import validate_method

        self.sparse_embedding = validate_method(sparse_embedding)
        self.mode = mode
        self.in_batch_neg = in_batch_neg
        self.in_batch_neg_ratio = in_batch_neg_ratio
        self.hard_negative = hard_negative
        self.neg_pool = neg_pool
        self.sampler_seed = sampler_seed if sampler_seed is not None else seed
        self.reg_loss_fn = RegularizationLoss(**(regularization_params or {}))
        self.early_stopper = EarlyStopper(patience=earlystop_patience)
        # device-side loop: N optimizer steps per dispatch via lax.scan
        # (launch-latency amortization, see CTRTrainer.steps_per_call)
        self.steps_per_call = int(steps_per_call)
        self._train_step = None
        self._train_steps_scan = None
        self._predict_step = None
        self._tower_steps = {}

    # -- jitted steps -------------------------------------------------------
    def _build_steps(self):
        model, mode, reg = self.model, self.mode, self.reg_loss_fn
        in_batch = self.in_batch_neg
        neg_ratio, hard = self.in_batch_neg_ratio, self.hard_negative
        mesh = self.mesh
        # local pool only differs from global when the batch actually shards
        local_pool = self.neg_pool == "local" and mesh is not None and mesh.shape.get("data", 1) > 1

        def apply_model(params, batch_stats, x, rng, method=None, **kwargs):
            variables = {"params": params, "batch_stats": batch_stats}
            with self.pscope():
                return model.apply(variables, x, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats"], method=method, **kwargs)

        def mode_loss(apply_fn, x, y, w, rng, sample_rng):
            """Shared mode-0/1/2 + in-batch loss dispatch; ``apply_fn(x, rng,
            method=...)`` returns ``(outputs, mutated_vars)``."""
            if in_batch:
                (user_emb, item_emb), mutated = apply_fn(x, rng, method="towers")
                user_emb = user_emb.reshape(user_emb.shape[0], -1) if user_emb.ndim == 3 and user_emb.shape[1] == 1 else user_emb
                item_emb = item_emb.reshape(item_emb.shape[0], -1) if item_emb.ndim == 3 and item_emb.shape[1] == 1 else item_emb
                if local_pool:
                    w_arr = jnp.ones(user_emb.shape[0], user_emb.dtype) if w is None else w
                    loss = local_inbatch_loss(user_emb, item_emb, w_arr, sample_rng, mesh, mode, neg_ratio=neg_ratio, hard_negative=hard)
                else:
                    scores = user_emb @ item_emb.T  # (B, B) — global batch under SPMD jit
                    neg_idx = inbatch_negative_sampling(scores, neg_ratio=neg_ratio, hard_negative=hard, rng=sample_rng)
                    logits = gather_inbatch_logits(scores, neg_idx)
                    if mode == 1:
                        loss = bpr_loss(logits[:, 0], logits[:, 1:], weight=w)
                    else:
                        loss = softmax_cross_entropy(logits, jnp.zeros(logits.shape[0], jnp.int32), weight=w)
            elif mode == 1:
                (pos_score, neg_score), mutated = apply_fn(x, rng)
                loss = bpr_loss(pos_score, neg_score, weight=w)
            elif mode == 2:
                scores, mutated = apply_fn(x, rng)
                loss = softmax_cross_entropy(scores, y.astype(jnp.int32), weight=w)
            else:
                y_pred, mutated = apply_fn(x, rng)
                loss = bce_with_logits(y_pred, y.astype(jnp.float32), weight=w)
            return loss, mutated

        def loss_fn(params, batch_stats, x, y, w, rng, sample_rng):
            def apply_fn(x, rng, method=None):
                return apply_model(params, batch_stats, x, rng, method=method)

            loss, mutated = mode_loss(apply_fn, x, y, w, rng, sample_rng)
            if reg:
                loss = loss + reg(params)
            return loss, mutated.get("batch_stats", batch_stats)

        self._mode_loss = mode_loss

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, x, y, w, lr, rng, sample_rng):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, x, y, w, rng, sample_rng)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = apply_updates(state.params, updates, lr)
            return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: TrainState, xs, ys, ws, lr, rng, sample_rng):
            """N optimizer steps in one dispatch (stacked (N, B, ...) batches)."""
            n = ys.shape[0]
            rngs = jax.random.split(rng, n)
            sample_rngs = jax.vmap(lambda i: jax.random.fold_in(sample_rng, i))(jnp.arange(n))

            def body(state, batch):
                x, y, w, r, sr = batch
                (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, x, y, w, r, sr)
                updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
                params = apply_updates(state.params, updates, lr)
                return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

            return jax.lax.scan(body, state, (xs, ys, ws, rngs, sample_rngs))

        @jax.jit
        def predict_step(params, batch_stats, x):
            with self.pscope():
                out = model.apply({"params": params, "batch_stats": batch_stats}, x, training=False)
            return jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), out)

        self._train_step, self._train_steps_scan, self._predict_step = train_step, train_steps_scan, predict_step
        if self.sparse_embedding:
            self._build_sparse_steps()

        for tower in ("user", "item"):

            @partial(jax.jit, static_argnames=())
            def tower_step(params, batch_stats, x, _tower=tower):
                with self.pscope():
                    out = model.apply({"params": params, "batch_stats": batch_stats}, x, training=False, mode=_tower)
                return out.astype(jnp.float32)

            self._tower_steps[tower] = tower_step

    def _build_sparse_steps(self):
        """Row-wise sparse table updates (see ``trainers/sparse.py``).

        Matching feature tables have genuinely sparse gradients (each batch
        touches B user rows + B item rows of potentially multi-million-row
        vocabs; reference two-tower semantics
        ``torch_rechub/models/matching/dssm.py:38-72``), so the full dense
        Adam pass the reference runs over them is pure overhead at production
        sizes.  The perturbation template is built through the SAME apply
        path training uses (``towers`` for in-batch, full forward otherwise).
        """
        from ..ops import sparse_update as su
        from . import sparse as sp

        model, reg = self.model, self.reg_loss_fn
        in_batch = self.in_batch_neg
        mode_loss = self._mode_loss

        x0 = {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in self._x0_dev.items()}

        def _pert_shapes(p, b, x):
            with self.pscope():
                return model.apply({"params": p, "batch_stats": b}, x, training=False, mutable=["perturbations"], method="towers" if in_batch else None)[1]

        pert_template = sp.pert_template_from(_pert_shapes, self.state.params, self.state.batch_stats, x0)

        def sparse_loss_fn(rest_flat, perts, tables_flat, batch_stats, x, y, w, rng, sample_rng):
            params = su.merge_params(tables_flat, rest_flat)

            def apply_fn(x, rng, method=None):
                variables = {"params": params, "batch_stats": batch_stats, "perturbations": perts}
                with self.pscope():
                    return model.apply(variables, x, training=True, rngs={"dropout": rng, "routing": rng}, mutable=["batch_stats", "embedding_ids"], method=method)

            loss, mutated = mode_loss(apply_fn, x, y, w, rng, sample_rng)
            if reg:
                loss = loss + reg(su.merge_params({}, rest_flat))
            return loss, (mutated.get("batch_stats", batch_stats), mutated.get("embedding_ids", {}))

        one_sparse_step = sp.make_sparse_step(self, sparse_loss_fn, pert_template, self.sparse_embedding)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, x, y, w, lr, rng, sample_rng):
            return one_sparse_step(state, (x, y, w, rng, sample_rng), lr)

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state, xs, ys, ws, lr, rng, sample_rng):
            n = ys.shape[0]
            rngs = jax.random.split(rng, n)
            sample_rngs = jax.vmap(lambda i: jax.random.fold_in(sample_rng, i))(jnp.arange(n))

            def body(state, batch):
                x, y, w, r, sr = batch
                return one_sparse_step(state, (x, y, w, r, sr), lr)

            return jax.lax.scan(body, state, (xs, ys, ws, rngs, sample_rngs))

        self._train_step, self._train_steps_scan = train_step, train_steps_scan

    def _ensure_ready(self, loader):
        if self.state is None:
            batch = loader.first_batch()
            x0 = batch[0] if isinstance(batch, tuple) else batch
            x0p, _, _ = pad_batch(x0, None, loader.batch_size)
            self._x0_dev = {k: np.asarray(v) for k, v in x0p.items()}
            self.init_state(x0p)
            if self.sparse_embedding:
                from .sparse import init_sparse_opt_state

                init_sparse_opt_state(self)
        if self._train_step is None:
            self._build_steps()

    # -- public API ---------------------------------------------------------
    def _iter_groups(self, data_loader):
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
        ys = np.stack([b[1] for b in pending])  # dtype preserved (mode-2 int labels)
        ws = np.stack([b[2] for b in pending]).astype(np.float32)
        return xs, ys, ws

    def train_one_epoch(self, data_loader, log_interval: int = 10, lr: Optional[float] = None) -> float:
        self._ensure_ready(data_loader)
        lr = self.lr0 if lr is None else lr
        lr_dev = jnp.asarray(lr, jnp.float32)
        losses = []
        sampler_key = jax.random.PRNGKey(self.sampler_seed)
        # host-side step counter: one device sync per epoch instead of one per flush
        host_step = int(self.state.step)
        n_seen = 0
        t0 = time.perf_counter()

        from ..data.dataset import prefetch_to_device
        from ..parallel import mesh as mesh_lib

        sharding = mesh_lib.scan_batch_sharding(self.mesh)
        groups = prefetch_to_device(self._iter_groups(data_loader), size=2, sharding=sharding)
        for gi, (xs, ys, ws) in enumerate(groups):
            sample_rng = jax.random.fold_in(sampler_key, host_step)
            self.state, group = self._train_steps_scan(self.state, xs, ys, ws, lr_dev, self.next_dropout_rng(), sample_rng)
            losses.append(group)
            host_step += int(ys.shape[0])
            n_seen += int(ys.shape[0]) * int(ys.shape[1])
            if log_interval and (gi + 1) % log_interval == 0:
                dt = time.perf_counter() - t0
                print(f"  train {n_seen} examples, loss {float(jnp.mean(group)):.5f}, {n_seen / dt:,.0f} ex/s")
        if not losses:
            return 0.0
        return float(np.mean(np.concatenate([to_numpy(l).reshape(-1) for l in losses])))

    def fit(self, train_dataloader, val_dataloader=None, log_interval: int = 10):
        self._ensure_ready(train_dataloader)
        for logger in iter_loggers(self.loggers):
            logger.log_hyperparams({"n_epoch": self.n_epoch, "learning_rate": self.lr0, "loss_mode": self.mode})
        for epoch_i in range(self.n_epoch):
            lr = self.epoch_lr(epoch_i)
            t0 = time.perf_counter()
            train_loss = self.train_one_epoch(train_dataloader, log_interval, lr=lr)
            print(f"epoch: {epoch_i} train loss: {train_loss:.5f} ({time.perf_counter()-t0:.2f}s)")
            for logger in iter_loggers(self.loggers):
                logger.log_metrics({"train/loss": train_loss, "learning_rate": lr}, step=epoch_i)
            if val_dataloader:
                auc = self.evaluate(self.model, val_dataloader)
                print(f"epoch: {epoch_i} validation auc: {auc:.5f}")
                for logger in iter_loggers(self.loggers):
                    logger.log_metrics({"val/auc": auc}, step=epoch_i)
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

    def evaluate(self, model, data_loader) -> float:
        targets, predicts = [], []
        self._ensure_ready(data_loader)
        batch_size = data_loader.batch_size
        for x, y in data_loader:
            n = len(next(iter(x.values())))
            x, y, _ = pad_batch(x, y, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            pred = to_numpy(self._predict_step(self.state.params, self.state.batch_stats, x)).reshape(-1)[:n]
            predicts.append(pred)
            targets.append(np.asarray(y).reshape(-1)[:n])
        return auc_score(np.concatenate(targets), np.concatenate(predicts))

    def predict(self, model, data_loader):
        self._ensure_ready(data_loader)
        batch_size = data_loader.batch_size
        out = []
        for batch in data_loader:
            x = batch[0] if isinstance(batch, tuple) else batch
            n = len(next(iter(x.values())))
            x, _, _ = pad_batch(x, None, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            out.append(to_numpy(self._predict_step(self.state.params, self.state.batch_stats, x))[:n])
        return np.concatenate(out)

    def inference_embedding(self, model, mode, data_loader, model_path):
        """Stream tower embeddings from the best checkpoint (reference ``:250-264``)."""
        assert mode in ("user", "item"), f"Invalid mode={mode}."
        self._ensure_ready(data_loader)
        if model_path and os.path.exists(os.path.join(model_path, "model.msgpack")):
            restored = load_checkpoint(model_path, self.variables())
            self.state = self.state.replace(params=restored["params"], batch_stats=restored.get("batch_stats", self.state.batch_stats))
        step = self._tower_steps[mode]
        batch_size = data_loader.batch_size
        out = []
        for batch in data_loader:
            x = batch[0] if isinstance(batch, tuple) else batch
            n = len(next(iter(x.values())))
            x, _, _ = pad_batch(x, None, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            out.append(to_numpy(step(self.state.params, self.state.batch_stats, x))[:n])
        return np.concatenate(out)
