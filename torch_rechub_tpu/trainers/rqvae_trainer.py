"""RQVAETrainer — trains RQVAEModel on item embeddings.

API parity with ``torch_rechub/trainers/rqvae_trainer.py``: NaN loss check,
collision-rate evaluation every ``eval_step`` epochs, keeps both best-loss
and best-collision-rate checkpoints, and ``generate_semantic_ids`` with the
Sinkhorn collision retry loop (reference ``rqvae.py:611-698``).
"""

from __future__ import annotations

import collections
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..basic.tracking import iter_loggers
from ..models.generative.rqvae import RQVAEModel, kmeans_init_codebooks
from .base import JaxTrainer, TrainState, apply_updates, save_checkpoint, to_numpy


class RQVAETrainer(JaxTrainer):
    def __init__(self, model: RQVAEModel, optimizer_params=None, scheduler_params=None, n_epoch=100, eval_step=5, model_path="./", use_sk: bool = True, model_logger=None, mesh=None, seed=0):
        super().__init__(model, optimizer_params, scheduler_params, n_epoch, 10, model_path, mesh, seed, model_logger)
        self.eval_step = eval_step
        self.use_sk = use_sk
        self.best_loss = np.inf
        self.best_collision_rate = np.inf
        self._train_step = None

    def init_state_from_data(self, data: np.ndarray):
        init_rng, self._rng = jax.random.split(self._rng)
        x = jnp.asarray(data[: min(512, len(data))])
        variables = self.model.init({"params": init_rng, "dropout": init_rng}, x, training=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.model.kmeans_init:
            params = kmeans_init_codebooks(self.model, {"params": params, "batch_stats": batch_stats}, np.asarray(data[: min(len(data), 8192)]), num_iters=self.model.kmeans_iters, seed=self.seed)
        if self.mesh is not None:
            # DP-only SPMD: all RQ-VAE params (MLPs + codebooks) replicate;
            # batches shard over `data` in the train loop below
            from ..parallel import mesh as mesh_lib

            params = mesh_lib.shard_params(params, self.mesh)
            batch_stats = jax.tree_util.tree_map(lambda a: jax.device_put(a, mesh_lib.replicated_sharding(self.mesh)), batch_stats)
        opt_state = self.tx.init(params)
        self.state = TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        return self.state

    def _build_steps(self):
        model, use_sk = self.model, self.use_sk

        def loss_fn(params, batch_stats, x, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            (out, rq_loss, _), mutated = model.apply(variables, x, use_sk=use_sk, training=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            if model.loss_type == "mse":
                recon = jnp.mean((out - x) ** 2)
            else:
                recon = jnp.mean(jnp.abs(out - x))
            return recon + model.quant_loss_weight * rq_loss, mutated.get("batch_stats", batch_stats)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, x, lr, rng):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, state.batch_stats, x, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = apply_updates(state.params, updates, lr)
            return TrainState(params=params, batch_stats=new_bs, opt_state=opt_state, step=state.step + 1), loss

        self._train_step = train_step

    def _iter_batches(self, data, batch_size, shuffle=True, epoch=0):
        n = len(data)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        for s in range(0, n - batch_size + 1, batch_size):
            yield data[order[s:s + batch_size]]

    def fit(self, data, batch_size: int = 1024):
        """Train on an (N, in_dim) embedding matrix."""
        data = np.asarray(data, dtype=np.float32)
        if self.state is None:
            self.init_state_from_data(data)
        if self._train_step is None:
            self._build_steps()
        for logger in iter_loggers(self.loggers):
            logger.log_hyperparams({"n_epoch": self.n_epoch, "learning_rate": self.lr0})
        for epoch_i in range(self.n_epoch):
            lr = self.epoch_lr(epoch_i)
            losses = []
            t0 = time.perf_counter()
            for xb in self._iter_batches(data, batch_size, epoch=epoch_i):
                rng = self.next_dropout_rng()
                self.state, loss = self._train_step(self.state, self.place_batch(jnp.asarray(xb)), jnp.asarray(lr, jnp.float32), rng)
                losses.append(loss)
            epoch_loss = float(np.mean([to_numpy(l) for l in losses])) if losses else 0.0
            if not np.isfinite(epoch_loss):
                raise ValueError(f"Loss is {epoch_loss} at epoch {epoch_i}; training diverged.")
            print(f"epoch: {epoch_i} loss: {epoch_loss:.6f} ({time.perf_counter()-t0:.2f}s)")
            for logger in iter_loggers(self.loggers):
                logger.log_metrics({"train/loss": epoch_loss}, step=epoch_i)
            if epoch_loss < self.best_loss:
                self.best_loss = epoch_loss
                save_checkpoint(self.model_path, self.variables(), "best_loss_model.msgpack")
            if (epoch_i + 1) % self.eval_step == 0:
                rate = self.evaluate(data, batch_size)
                print(f"epoch: {epoch_i} collision rate: {rate:.6f}")
                for logger in iter_loggers(self.loggers):
                    logger.log_metrics({"val/collision_rate": rate}, step=epoch_i)
                if rate < self.best_collision_rate:
                    self.best_collision_rate = rate
                    save_checkpoint(self.model_path, self.variables(), "best_collision_model.msgpack")
        self.save()
        for logger in iter_loggers(self.loggers):
            logger.finish()
        return self.best_loss, self.best_collision_rate

    def evaluate(self, data, batch_size: int = 1024) -> float:
        """Semantic-id collision rate over the dataset."""
        sids = self._indices(data, batch_size, use_sk=False)
        strs = [str(list(row)) for row in sids]
        return (len(strs) - len(set(strs))) / max(len(strs), 1)

    def _indices(self, data, batch_size, use_sk, sk_epsilon_overrides=None):
        out = []
        variables = self.variables()
        for s in range(0, len(data), batch_size):
            xb = jnp.asarray(np.asarray(data[s:s + batch_size], dtype=np.float32))
            idx = self.model.apply(variables, xb, use_sk=use_sk, sk_epsilon_overrides=sk_epsilon_overrides, method=RQVAEModel.get_indices)
            out.append(np.asarray(idx))
        return np.concatenate(out)

    def generate_semantic_ids(self, data, batch_size: int = 1024, prefix=("<a_{}>", "<b_{}>", "<c_{}>", "<d_{}>", "<e_{}>"), max_retries: int = 20):
        """Per-item semantic-id codes with Sinkhorn collision resolution."""
        n_stages = len(self.model.num_emb_list)
        if len(prefix) < n_stages:
            raise ValueError("The length of prefix should be no less than that of num_emb_list")
        data = np.asarray(data, dtype=np.float32)
        sids = self._indices(data, batch_size, use_sk=False)
        codes = [[prefix[i].format(int(v)) for i, v in enumerate(row)] for row in sids]
        code_strs = [str(c) for c in codes]

        # collision retry: re-assign only the last stage with Sinkhorn
        overrides = [0.0] * (n_stages - 1) + [self.model.sk_epsilons[-1] if self.model.sk_epsilons and self.model.sk_epsilons[-1] > 0 else 0.003]
        for _ in range(max_retries):
            groups = collections.defaultdict(list)
            for i, cs in enumerate(code_strs):
                groups[cs].append(i)
            collisions = [idxs for idxs in groups.values() if len(idxs) > 1]
            if not collisions:
                break
            for items in collisions:
                idx = self._indices(data[np.asarray(items)], batch_size, use_sk=True, sk_epsilon_overrides=tuple(overrides))
                for item, row in zip(items, idx):
                    codes[item] = [prefix[i].format(int(v)) for i, v in enumerate(row)]
                    code_strs[item] = str(codes[item])
        counts = collections.Counter(code_strs)
        rate = (len(code_strs) - len(set(code_strs))) / max(len(code_strs), 1)
        print(f"All indices number: {len(codes)}; max conflicts: {max(counts.values())}; collision rate: {rate:.6f}")
        return {i: list(c) for i, c in enumerate(codes)}
