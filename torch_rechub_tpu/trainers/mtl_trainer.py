"""MTLTrainer — multi-task training with adaptive loss weighting.

API parity with ``torch_rechub/trainers/mtl_trainer.py:40-260``: per-task
losses/metrics from ``task_types``, aggregation by mean / UWL uncertainty
weighting / GradNorm / MetaBalance, the ESMM special case (loss over
ctr+ctcvr only), early stopping on ``earlystop_taskid``'s metric, and
checkpoints named ``model_{mode}_{seed}.msgpack``.

TPU design — everything happens inside ONE jitted train step per method:

- default/UWL: a single backward over a combined ``{model, loss_weight}``
  pytree (UWL's ``Σ 2L_i e^{-w_i} + w_i`` is just part of the loss).
- GradNorm: per-task backwards give the shared-layer gradient norms; the
  loss-weight gradient is computed analytically (``utils/mtl.py`` here), and
  weights are renormalized to sum to n_task after the step.
- MetaBalance: per-task gradient pytrees; shared parameters (path-classified)
  get the moving-average-norm-scaled sum, task parameters the plain sum —
  equivalent to the reference's dual-optimizer scheme but as pure data flow.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..basic.callback import EarlyStopper
from ..basic.loss import RegularizationLoss
from ..basic.metric import auc_score
from ..basic.tracking import iter_loggers
from ..models.multi_task import ESMM
from ..utils.data import pad_batch
from ..utils.mtl import gradnorm_weight_grads, metabalance_scale, shared_task_mask
from .base import JaxTrainer, apply_updates, to_numpy


@flax.struct.dataclass
class MTLTrainState:
    params: Any
    loss_weight: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    mb_norms: Any
    initial_task_loss: Any


def _aggregate_losses(loss_list, loss_weight, method, is_esmm):
    """Task-loss aggregation shared by the dense and sparse steps.

    ESMM sums the derived tasks (its task 0 is implicit through masking);
    UWL is the homoscedastic-uncertainty weighting; GradNorm weights are
    learned multipliers; default is the plain mean.
    """
    if is_esmm:
        return jnp.sum(loss_list[1:])
    if method == "uwl":
        w = jnp.maximum(loss_weight, 0.0)
        return jnp.sum(2.0 * loss_list * jnp.exp(-w) + w)
    if method == "gradnorm":
        return jnp.sum(loss_list * loss_weight)
    return jnp.mean(loss_list)


def _task_loss(pred, y, task_type, weight):
    """Per-task loss on model outputs (probabilities, reference semantics);
    computed in f32 regardless of the model's compute precision."""
    pred = pred.astype(jnp.float32)
    w = weight
    if task_type == "classification":
        p = jnp.clip(pred, 1e-7, 1 - 1e-7)
        loss = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    else:
        loss = (pred - y) ** 2
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-12)


class MTLTrainer(JaxTrainer):
    def __init__(self, model, task_types, optimizer_params=None, regularization_params=None, scheduler_params=None, adaptive_params=None, n_epoch=10, earlystop_taskid=0, earlystop_patience=10, model_path="./", model_logger=None, mesh=None, seed=0, steps_per_call=1, sparse_embedding=None, precision=None):
        super().__init__(model, optimizer_params, scheduler_params, n_epoch, earlystop_patience, model_path, mesh, seed, model_logger, precision=precision)
        # steps_per_call > 1 runs that many optimizer steps per device
        # dispatch via lax.scan over stacked batches (see CTRTrainer).
        self.steps_per_call = int(steps_per_call)
        self.task_types = tuple(task_types)
        self.n_task = len(task_types)
        self.earlystop_taskid = earlystop_taskid
        self.early_stopper = EarlyStopper(patience=earlystop_patience)
        self.reg_loss_fn = RegularizationLoss(**(regularization_params or {}))
        self.adaptive_method = None
        self.adaptive_params = adaptive_params or {}
        if adaptive_params is not None:
            method = adaptive_params["method"]
            if method not in ("uwl", "metabalance", "gradnorm"):
                raise ValueError(f"unknown adaptive method {method}")
            self.adaptive_method = method
        self.alpha = self.adaptive_params.get("alpha", 0.16)
        self.relax_factor = self.adaptive_params.get("relax_factor", 0.7)
        self.beta = self.adaptive_params.get("beta", 0.9)
        # sparse_embedding: None | "sgd" | "adagrad" — row-wise updates of the
        # fused feature tables (production MTL configs like Ali-CCP carry
        # 100k+ user/item vocabs).  Only for mean/uwl/esmm aggregation:
        # GradNorm and MetaBalance take PER-TASK gradients of every shared
        # parameter — each task would need its own dense table cotangent,
        # which is exactly what the sparse path exists to avoid.
        from .sparse import validate_method

        self.sparse_embedding = validate_method(sparse_embedding)
        if self.sparse_embedding and self.adaptive_method in ("gradnorm", "metabalance"):
            raise ValueError(
                f"sparse_embedding is incompatible with adaptive method {self.adaptive_method!r}: "
                "per-task gradient surgery needs a dense per-task gradient over every shared "
                "parameter (including the tables). Use mean/uwl aggregation with sparse tables, "
                "or the dense path for gradnorm/metabalance."
            )
        self.is_esmm = isinstance(model, ESMM)
        self.state: Optional[MTLTrainState] = None
        self._train_step = None
        self._train_steps_scan = None
        self._predict_step = None
        self.loss_weight_history = []

    # -- state --------------------------------------------------------------
    def init_state(self, x_sample):
        init_rng, self._rng = jax.random.split(self._rng)
        x_dev = {k: jnp.asarray(v) for k, v in x_sample.items()}
        def _init(rngs, x):
            with self.pscope():
                return self.model.init(rngs, x, training=False)

        init_fn = jax.jit(_init)
        variables = init_fn({"params": init_rng, "dropout": init_rng}, x_dev)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib

            params = mesh_lib.shard_params(params, self.mesh)
            batch_stats = jax.tree_util.tree_map(lambda a: jax.device_put(a, mesh_lib.replicated_sharding(self.mesh)), batch_stats)
        if self.adaptive_method == "uwl":
            loss_weight = jnp.zeros((self.n_task,), jnp.float32)
        elif self.adaptive_method == "gradnorm":
            loss_weight = jnp.ones((self.n_task,), jnp.float32)
        else:
            loss_weight = None
        trainable = {"model": params} if loss_weight is None else {"model": params, "loss_weight": loss_weight}
        if self.sparse_embedding:
            from ..ops import sparse_update as su

            tables_flat, rest_flat = su.split_fused_tables(params)
            if not tables_flat:
                raise ValueError(
                    "sparse_embedding requires fused embedding tables; the default 'auto' layout "
                    "only fuses tables with >=262144 rows — call ops.embedding.set_fused_default(True) "
                    "before building the model to fuse everything"
                )
            dense_trainable = dict(trainable, model=su.merge_params({}, rest_flat))
            opt_state = (self.tx.init(dense_trainable), su.init_accumulators(tables_flat))
        else:
            opt_state = self.tx.init(trainable)
        mb_norms = None
        if self.adaptive_method == "metabalance":
            mb_norms = tuple(jnp.zeros((self.n_task,), jnp.float32) for _ in jax.tree_util.tree_leaves(params))
        self.state = MTLTrainState(params=params, loss_weight=loss_weight, batch_stats=batch_stats, opt_state=opt_state, step=jnp.zeros((), jnp.int32), mb_norms=mb_norms, initial_task_loss=jnp.zeros((self.n_task,), jnp.float32))
        return self.state

    def variables(self, state=None):
        state = state or self.state
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    # -- jitted steps -------------------------------------------------------
    def _build_steps(self):
        model, reg = self.model, self.reg_loss_fn
        task_types, n_task, is_esmm = self.task_types, self.n_task, self.is_esmm
        method = self.adaptive_method
        alpha, relax, beta = self.alpha, self.relax_factor, self.beta
        tx = self.tx

        def forward_losses(params, batch_stats, x, ys, w, rng):
            with self.pscope():
                out, mutated = model.apply({"params": params, "batch_stats": batch_stats}, x, training=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            loss_list = jnp.stack([_task_loss(out[:, i], ys[:, i].astype(jnp.float32), task_types[i], w) for i in range(n_task)])
            return loss_list, mutated.get("batch_stats", batch_stats)

        def aggregate(loss_list, loss_weight):
            return _aggregate_losses(loss_list, loss_weight, method, is_esmm)

        # last 2-D shared leaf for GradNorm's norm computation
        def last_shared_2d_path(params):
            mask = shared_task_mask(params)
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            mflat = jax.tree_util.tree_leaves(mask)
            candidates = [jax.tree_util.keystr(p) for (p, leaf), m in zip(flat, mflat) if m and leaf.ndim == 2]
            return sorted(candidates)[-1] if candidates else None

        def step_body(state: MTLTrainState, x, ys, w, lr, rng):
            def total_loss_fn(trainable, batch_stats):
                loss_list, new_bs = forward_losses(trainable["model"], batch_stats, x, ys, w, rng)
                loss = aggregate(loss_list, trainable.get("loss_weight"))
                if reg:
                    loss = loss + reg(trainable["model"])
                return loss, (loss_list, new_bs)

            trainable = {"model": state.params}
            if state.loss_weight is not None:
                trainable["loss_weight"] = state.loss_weight

            if method == "metabalance":
                # per-task gradient pytrees
                def task_loss_i(params, i):
                    loss_list, new_bs = forward_losses(params, state.batch_stats, x, ys, w, rng)
                    return loss_list[i], (loss_list, new_bs)

                grads_list, loss_list, new_bs = [], None, None
                for i in range(n_task):
                    (li, (ll, bs)), gi = jax.value_and_grad(task_loss_i, has_aux=True)(state.params, i)
                    grads_list.append(gi)
                    loss_list, new_bs = ll, bs
                scaled_sum, new_norms = metabalance_scale(grads_list, state.mb_norms, relax, beta)
                plain_sum = jax.tree_util.tree_map(lambda *gs: sum(gs), *grads_list)
                mask = shared_task_mask(state.params)
                grads = jax.tree_util.tree_map(lambda m, s, p: s if m else p, mask, scaled_sum, plain_sum)
                updates, opt_state = tx.update({"model": grads}, state.opt_state, {"model": state.params})
                params = apply_updates(state.params, updates["model"], lr)
                return state.replace(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1, mb_norms=new_norms), loss_list

            (loss, (loss_list, new_bs)), grads = jax.value_and_grad(total_loss_fn, has_aux=True)(trainable, state.batch_stats)
            initial = jax.lax.cond(state.step == 0, lambda: loss_list, lambda: state.initial_task_loss)

            if method == "gradnorm":
                path = self._gradnorm_leaf_path
                flat = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])

                def shared_leaf_grad(i):
                    def fi(params):
                        ll, _ = forward_losses(params, state.batch_stats, x, ys, w, rng)
                        return ll[i]

                    g = jax.grad(fi)(state.params)
                    leaf = [l for p, l in jax.tree_util.tree_flatten_with_path(g)[0] if jax.tree_util.keystr(p) == path][0]
                    return jnp.linalg.norm(leaf.reshape(-1))

                norms = jnp.stack([shared_leaf_grad(i) for i in range(n_task)])
                w_grad = gradnorm_weight_grads(norms, trainable["loss_weight"], loss_list, initial, alpha)
                grads["loss_weight"] = w_grad

            updates, opt_state = tx.update(grads, state.opt_state, trainable)
            new_trainable = apply_updates(trainable, updates, lr)
            loss_weight = new_trainable.get("loss_weight")
            if method == "gradnorm":
                loss_weight = loss_weight * (n_task / jnp.maximum(jnp.sum(loss_weight), 1e-12))
            return state.replace(params=new_trainable["model"], loss_weight=loss_weight, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1, initial_task_loss=initial), loss_list

        train_step = partial(jax.jit, donate_argnums=(0,))(step_body)

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: MTLTrainState, xs, yss, ws, lr, rng):
            """N optimizer steps in one dispatch: scan over stacked batches."""
            rngs = jax.random.split(rng, yss.shape[0])

            def body(state, batch):
                x, ys_b, w_b, r = batch
                return step_body(state, x, ys_b, w_b, lr, r)

            return jax.lax.scan(body, state, (xs, yss, ws, rngs))

        @jax.jit
        def predict_step(params, batch_stats, x):
            with self.pscope():
                out = model.apply({"params": params, "batch_stats": batch_stats}, x, training=False)
            return out.astype(jnp.float32)

        self._train_step, self._train_steps_scan, self._predict_step = train_step, train_steps_scan, predict_step
        if self.sparse_embedding:
            self._build_sparse_steps()

    def _build_sparse_steps(self):
        """Row-wise sparse table updates for mean/uwl/esmm aggregation.

        Same mechanism as the other trainers (``trainers/sparse.py``): the
        tables are excluded from jax.grad, d loss/d gathered-rows comes from
        the perturbation hooks, and scatter updates touch only the rows the
        batch used.  The dense optax path keeps ``loss_weight`` (UWL) and
        every non-table parameter.  Regularization applies to dense params.
        """
        from flax import traverse_util

        from ..ops import sparse_update as su
        from . import sparse as sp

        model, reg = self.model, self.reg_loss_fn
        task_types, n_task, is_esmm = self.task_types, self.n_task, self.is_esmm
        method = self.adaptive_method
        tx = self.tx
        sparse_method = self.sparse_embedding

        def pert_template(state, x):
            sds = {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in x.items()}

            def _shapes(p, b, xx):
                with self.pscope():
                    return model.apply({"params": p, "batch_stats": b}, xx, training=False, mutable=["perturbations"])[1]

            return sp.pert_template_from(_shapes, state.params, state.batch_stats, sds)

        def step_body(state: MTLTrainState, x, ys, w, lr, rng):
            tables_flat, rest_flat = su.split_fused_tables(state.params)
            opt_state, accums = state.opt_state
            perts = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), pert_template(state, x))

            def loss_fn(trainable, perts):
                params = su.merge_params(tables_flat, traverse_util.flatten_dict(trainable["model"]))
                with self.pscope():
                    out, mutated = model.apply({"params": params, "batch_stats": state.batch_stats, "perturbations": perts}, x, training=True, rngs={"dropout": rng}, mutable=["batch_stats", "embedding_ids"])
                loss_list = jnp.stack([_task_loss(out[:, i], ys[:, i].astype(jnp.float32), task_types[i], w) for i in range(n_task)])
                loss = _aggregate_losses(loss_list, trainable.get("loss_weight"), method, is_esmm)
                if reg:
                    loss = loss + reg(trainable["model"])
                return loss, (loss_list, mutated.get("batch_stats", state.batch_stats), mutated.get("embedding_ids", {}))

            trainable = {"model": su.merge_params({}, rest_flat)}
            if state.loss_weight is not None:
                trainable["loss_weight"] = state.loss_weight
            (loss, (loss_list, new_bs, ids_tree)), (g_tr, g_pert) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(trainable, perts)
            updates, opt_state = tx.update(g_tr, opt_state, trainable)
            new_trainable = apply_updates(trainable, updates, lr)
            rest_flat = traverse_util.flatten_dict(new_trainable["model"])
            tables_flat, accums = sp.apply_sparse_table_updates(tables_flat, accums, g_pert, ids_tree, sparse_method, lr)
            params = su.merge_params(tables_flat, rest_flat)
            initial = jax.lax.cond(state.step == 0, lambda: loss_list, lambda: state.initial_task_loss)
            return state.replace(params=params, loss_weight=new_trainable.get("loss_weight"), batch_stats=new_bs, opt_state=(opt_state, accums), step=state.step + 1, initial_task_loss=initial), loss_list

        train_step = partial(jax.jit, donate_argnums=(0,))(step_body)

        @partial(jax.jit, donate_argnums=(0,))
        def train_steps_scan(state: MTLTrainState, xs, yss, ws, lr, rng):
            rngs = jax.random.split(rng, yss.shape[0])

            def body(state, batch):
                x, ys_b, w_b, r = batch
                return step_body(state, x, ys_b, w_b, lr, r)

            return jax.lax.scan(body, state, (xs, yss, ws, rngs))

        self._train_step, self._train_steps_scan = train_step, train_steps_scan

    def _ensure_ready(self, loader):
        if self.state is None:
            batch = loader.first_batch()
            x0 = batch[0] if isinstance(batch, tuple) else batch
            self.init_state(x0)
        if self._train_step is None:
            if self.adaptive_method == "gradnorm":
                from ..utils.mtl import shared_task_mask as stm

                mask = stm(self.state.params)
                flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
                mflat = jax.tree_util.tree_leaves(mask)
                cands = [jax.tree_util.keystr(p) for (p, leaf), m in zip(flat, mflat) if m and leaf.ndim == 2]
                if not cands:
                    raise ValueError("gradnorm requires a 2-D shared parameter")
                self._gradnorm_leaf_path = sorted(cands)[-1]
            self._build_steps()

    # -- public API ---------------------------------------------------------
    def _iter_groups(self, data_loader):
        batch_size = data_loader.batch_size
        pending = []
        for x, ys in data_loader:
            pending.append(pad_batch(x, ys, batch_size))
            if len(pending) >= max(1, self.steps_per_call):
                yield self._stack_group(pending)
                pending = []
        if pending:
            yield self._stack_group(pending)

    @staticmethod
    def _stack_group(pending):
        xs = {k: np.stack([b[0][k] for b in pending]) for k in pending[0][0]}
        yss = np.stack([b[1] for b in pending])
        ws = np.stack([b[2] for b in pending]).astype(np.float32)
        return xs, yss, ws

    def train_one_epoch(self, data_loader, lr: Optional[float] = None, log_interval: int = 10):
        self._ensure_ready(data_loader)
        lr = self.lr0 if lr is None else lr
        lr_dev = jnp.asarray(lr, jnp.float32)
        group_losses_dev = []  # (n_steps, n_task) device arrays — sync once per epoch
        n = 0
        n_seen = 0
        t0 = time.perf_counter()

        from ..data.dataset import prefetch_to_device
        from ..parallel import mesh as mesh_lib

        sharding = mesh_lib.scan_batch_sharding(self.mesh)
        groups = prefetch_to_device(self._iter_groups(data_loader), size=2, sharding=sharding)
        for gi, (xs, yss, ws) in enumerate(groups):
            self.state, group_losses = self._train_steps_scan(self.state, xs, yss, ws, lr_dev, self.next_dropout_rng())
            group_losses_dev.append(group_losses)
            n += int(yss.shape[0])
            n_seen += int(yss.shape[0]) * int(ws.shape[-1])
            if log_interval and (gi + 1) % log_interval == 0:
                dt = time.perf_counter() - t0
                print(f"  train {n_seen} examples, {n_seen / dt:,.0f} ex/s")
        totals = np.sum([to_numpy(jnp.sum(g, axis=0)) for g in group_losses_dev], axis=0) if group_losses_dev else np.zeros(self.n_task)
        loss_avg = (totals / max(n, 1)).tolist()
        print("train loss: ", {f"task_{i}:": loss_avg[i] for i in range(self.n_task)})
        if self.state.loss_weight is not None:
            print("loss weight: ", to_numpy(self.state.loss_weight).tolist())
        return loss_avg

    def fit(self, train_dataloader, val_dataloader, mode: str = "base", seed: int = 0):
        self._ensure_ready(train_dataloader)
        for logger in iter_loggers(self.loggers):
            logger.log_hyperparams({"n_epoch": self.n_epoch, "learning_rate": self.lr0, "adaptive_method": self.adaptive_method})
        total_log = []
        for epoch_i in range(self.n_epoch):
            lr = self.epoch_lr(epoch_i)
            t0 = time.perf_counter()
            train_losses = self.train_one_epoch(train_dataloader, lr=lr)
            print(f"epoch: {epoch_i} ({time.perf_counter()-t0:.2f}s)")
            scores = self.evaluate(self.model, val_dataloader)
            print(f"epoch: {epoch_i} validation scores: {scores}")
            logs = {f"train/task_{i}_loss": train_losses[i] for i in range(self.n_task)}
            logs.update({f"val/task_{i}_score": s for i, s in enumerate(scores)})
            if self.state.loss_weight is not None:
                logs.update({f"loss_weight/task_{i}": float(w) for i, w in enumerate(to_numpy(self.state.loss_weight))})
            for logger in iter_loggers(self.loggers):
                logger.log_metrics(logs, step=epoch_i)
            total_log.append(scores)
            if self.early_stopper.stop_training(scores[self.earlystop_taskid], jax.device_get(self.variables())):
                print(f"validation best score of main task {self.earlystop_taskid}: {self.early_stopper.best_auc:.6f}")
                best = self.early_stopper.best_weights
                self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
                break
        if self.early_stopper.best_weights is not None:
            best = self.early_stopper.best_weights
            self.state = self.state.replace(params=best["params"], batch_stats=best.get("batch_stats", self.state.batch_stats))
        self.save(f"model_{mode}_{seed}.msgpack")
        for logger in iter_loggers(self.loggers):
            logger.finish()
        return total_log

    def evaluate(self, model, data_loader):
        self._ensure_ready(data_loader)
        batch_size = data_loader.batch_size
        targets, predicts = [], []
        for x, ys in data_loader:
            n = len(next(iter(x.values())))
            x, ys, _ = pad_batch(x, ys, batch_size)
            x = self.place_batch({k: jnp.asarray(v) for k, v in x.items()})
            pred = to_numpy(self._predict_step(self.state.params, self.state.batch_stats, x))[:n]
            predicts.append(pred)
            targets.append(np.asarray(ys)[:n])
        targets = np.concatenate(targets)
        predicts = np.concatenate(predicts)
        scores = []
        for i, t in enumerate(self.task_types):
            if t == "classification":
                try:
                    scores.append(auc_score(targets[:, i], predicts[:, i]))
                except ValueError:
                    # degenerate split (single class in this task's labels) —
                    # score the task NaN instead of killing the whole eval
                    scores.append(float("nan"))
            else:
                scores.append(float(np.mean((targets[:, i] - predicts[:, i]) ** 2)))
        return scores

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
