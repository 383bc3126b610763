"""Shared trainer machinery: jitted train state, optimizer, checkpoints.

The reference trainers are torch epoch loops around ``loss.backward()``
(``torch_rechub/trainers/ctr_trainer.py:77-108``).  Here every trainer is a
thin Python epoch loop around ONE jitted, donated train step:
``value_and_grad(loss) -> optax update`` compiled once per (shape, model).
The learning rate is passed into the step as a traced scalar, so per-epoch
LR scheduling (reference StepLR) never triggers recompilation.

SPMD: if a ``jax.sharding.Mesh`` is supplied, parameters are placed with the
standard rules (tables row-sharded over ``model``, rest replicated) and every
batch is sharded over ``data``; XLA inserts psums for the gradient reduction.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax
import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import mesh as mesh_lib


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(optimizer_params: Optional[Dict] = None):
    """Torch-Adam-equivalent transform (L2-in-gradient weight decay).

    Returns ``(tx, lr0)``; ``tx`` excludes the learning rate — the step does
    ``p - lr * update`` with ``lr`` as a traced argument.

    ``embedding_optimizer`` (``"adagrad"`` | ``"sgd"``) switches the update
    rule for embedding-table parameters only (path-classified) — the standard
    production-recsys split (adaptive dense optimizer, cheap/sparse-friendly
    table optimizer) via ``optax.multi_transform``.
    """
    optimizer_params = dict(optimizer_params or {"lr": 1e-3, "weight_decay": 1e-5})
    lr = float(optimizer_params.pop("lr", 1e-3))
    wd = float(optimizer_params.pop("weight_decay", 0.0))
    b1 = float(optimizer_params.pop("betas", (0.9, 0.999))[0]) if "betas" in optimizer_params else 0.9
    emb_opt = optimizer_params.pop("embedding_optimizer", None)
    parts = []
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_adam(b1=b1))
    dense_tx = optax.chain(*parts)
    if emb_opt is None:
        return dense_tx, lr
    if emb_opt == "adagrad":
        emb_tx = optax.scale_by_rss(initial_accumulator_value=0.1)
    elif emb_opt == "sgd":
        emb_tx = optax.identity()
    else:
        raise ValueError(f"unknown embedding_optimizer {emb_opt!r}")
    from ..basic.loss import classify_param

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(lambda p, _: "emb" if classify_param(jax.tree_util.keystr(p)) == "embedding" else "dense", params)

    return optax.multi_transform({"emb": emb_tx, "dense": dense_tx}, label_tree), lr


def step_lr(lr0: float, epoch: int, scheduler_params: Optional[Dict]) -> float:
    """StepLR schedule at epoch granularity (reference trainers step per epoch)."""
    if not scheduler_params:
        return lr0
    step_size = int(scheduler_params.get("step_size", 1))
    gamma = float(scheduler_params.get("gamma", 0.1))
    return lr0 * gamma ** (epoch // step_size)


def apply_updates(params, updates, lr):
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)


def save_checkpoint(path: str, variables: Dict, name: str = "model.msgpack") -> str:
    os.makedirs(path or ".", exist_ok=True)
    target = os.path.join(path or ".", name)
    with open(target, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(variables)))
    return target


def _tree_keys(tree, prefix=""):
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= _tree_keys(v, f"{prefix}/{k}")
        return out or {prefix}
    return {prefix}


def _check_table_rows(restored, template, target):
    """Raise a targeted error when restored table ROW counts differ from the
    model's (flax.from_bytes restores silently even on shape mismatch).

    The common cause: a checkpoint saved before round 4's row padding —
    tables >= 65536 rows now pad to a 64-row multiple so they can row-shard.
    """
    r_tables, t_tables = _table_shapes(restored), _table_shapes(template)
    mismatched = {
        k: (r_tables[k], t_tables[k])
        for k in r_tables.keys() & t_tables.keys()
        if r_tables[k] != t_tables[k] and r_tables[k][1:] == t_tables[k][1:]
    }
    if mismatched:
        detail = ", ".join(f"{k}: checkpoint {c} vs model {t}" for k, (c, t) in sorted(mismatched.items()))
        err = ValueError(
            f"checkpoint {target!r} has embedding tables whose ROW counts differ from the "
            f"model's ({detail}). Tables >= 65536 rows are padded to a 64-row multiple so they "
            f"can row-shard (padded rows are zero and receive no gradient) — a checkpoint saved "
            f"before that padding cannot load directly. Either rebuild the model at the "
            f"checkpoint's shapes, or pad/slice the restored table rows to the new shape "
            f"(np.pad with zero rows / [:rows] slice) and re-serialize."
        )
        err._rechub_diagnosed = True
        raise err


def _table_shapes(tree, prefix=""):
    """{path: shape} for every *_table / *_embedding leaf with a shape."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_table_shapes(v, f"{prefix}/{k}"))
        return out
    name = prefix.rsplit("/", 1)[-1]
    shape = getattr(tree, "shape", None)
    if shape is not None and (name.endswith("_table") or name.endswith("_embedding")):
        out[prefix] = tuple(shape)
    return out


def load_checkpoint(path: str, template: Dict, name: str = "model.msgpack") -> Dict:
    target = path if os.path.isfile(path) else os.path.join(path, name)
    with open(target, "rb") as f:
        data = f.read()
    try:
        restored = flax.serialization.from_bytes(template, data)
        _check_table_rows(restored, template, target)
        return restored
    except (ValueError, KeyError) as e:
        if getattr(e, "_rechub_diagnosed", False):
            raise
        # Diagnose the most common structural break: a checkpoint written
        # under a different embedding-table layout ("fused" vs per-feature —
        # the default changed to "auto" in round 3; see docs/EMBEDDING.md).
        try:
            raw = flax.serialization.msgpack_restore(data)
        except Exception:
            raise e
        ckpt_keys, tmpl_keys = _tree_keys(raw), _tree_keys(template)
        _check_table_rows(raw, template, target)  # row-padding migration case
        ckpt_fused = any("fused_d" in k and k.endswith("_table") for k in ckpt_keys)
        tmpl_fused = any("fused_d" in k and k.endswith("_table") for k in tmpl_keys)
        if ckpt_fused != tmpl_fused:
            want = "set_fused_default(True)" if ckpt_fused else "set_fused_default(False)"
            raise ValueError(
                f"checkpoint {target!r} was saved with a {'fused' if ckpt_fused else 'per-feature'} "
                f"embedding-table layout but the model was built with the "
                f"{'fused' if tmpl_fused else 'per-feature'} layout (the default became 'auto' and "
                f"fuses only tables with >=262144 rows). Rebuild the model under the checkpoint's "
                f"layout — call torch_rechub_tpu.ops.embedding.{want} (or pass fused=... to the "
                f"model/EmbeddingCollection) before constructing it, then load again."
            ) from e
        raise


class JaxTrainer:
    """Common state for the concrete trainers (mesh, rngs, optimizer, ckpt)."""

    def __init__(self, model, optimizer_params=None, scheduler_params=None, n_epoch=10, earlystop_patience=10, model_path="./", mesh=None, seed=0, loggers=None, precision=None):
        self.model = model
        self.tx, self.lr0 = make_optimizer(optimizer_params)
        self.scheduler_params = scheduler_params
        self.n_epoch = n_epoch
        self.earlystop_patience = earlystop_patience
        self.model_path = model_path
        self.mesh = mesh
        self.seed = seed
        self.loggers = loggers
        # precision: None/"f32" keeps reference f32 numerics; "bf16" computes
        # in bfloat16 with f32 params/losses (see basic/precision.py).  The
        # scope wraps every model.init/apply TRACE, so it is baked into the
        # jitted executables without leaking to other trainers in-process.
        from ..basic.precision import _resolve
        _resolve(precision)  # validate eagerly
        self.precision = precision
        self.state: Optional[TrainState] = None
        self.const_vars: Dict = {}
        self._rng = jax.random.PRNGKey(seed)

    def pscope(self):
        """Precision context for model.init/apply traces (no-op when f32)."""
        from ..basic.precision import precision_scope

        return precision_scope(self.precision)

    # -- state -------------------------------------------------------------
    def init_state(self, x_sample) -> TrainState:
        init_rng, self._rng = jax.random.split(self._rng)
        x_dev = {k: jnp.asarray(v) for k, v in x_sample.items()}
        # jit the init: eager flax init dispatches hundreds of tiny ops, which
        # is pathological over a remote-device transport (one RTT per op).
        def _init(rngs, x):
            with self.pscope():
                return self.model.init(rngs, x, training=False)

        init_fn = jax.jit(_init)
        variables = init_fn({"params": init_rng, "dropout": init_rng, "routing": init_rng}, x_dev)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # perturbations/embedding_ids are per-batch transients created by the
        # sparse-gradient hooks during init — never constants to re-feed
        self.const_vars = {k: v for k, v in variables.items() if k not in ("params", "batch_stats", "perturbations", "embedding_ids", "intermediates")}
        if self.mesh is not None:
            params = mesh_lib.shard_params(params, self.mesh)
            batch_stats = jax.tree_util.tree_map(lambda x: jax.device_put(x, mesh_lib.replicated_sharding(self.mesh)), batch_stats)
        opt_state = self.tx.init(params)
        self.state = TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        return self.state

    def variables(self, state: Optional[TrainState] = None) -> Dict:
        state = state or self.state
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        v.update(getattr(self, "const_vars", {}))
        return v

    def place_batch(self, batch):
        return mesh_lib.shard_batch(batch, self.mesh) if self.mesh is not None else batch

    def epoch_lr(self, epoch: int) -> float:
        return step_lr(self.lr0, epoch, self.scheduler_params)

    def next_dropout_rng(self):
        rng, self._rng = jax.random.split(self._rng)
        return rng

    # -- step checkpoints (preemption-safe resume) --------------------------
    def enable_step_checkpointing(self, directory: str, every_n_steps: int = 100, max_to_keep: int = 3):
        """Checkpoint the FULL TrainState every N steps; resume via maybe_resume()."""
        from ..utils.checkpoint import TrainCheckpointer

        self._ckpt = TrainCheckpointer(directory, max_to_keep=max_to_keep)
        self._ckpt_every = every_n_steps
        return self._ckpt

    def maybe_step_checkpoint(self):
        ckpt = getattr(self, "_ckpt", None)
        if ckpt is None:
            return
        step = int(self.state.step)
        if step > 0 and step % self._ckpt_every == 0:
            ckpt.save(step, self.state)

    def maybe_resume(self):
        """Restore the latest step checkpoint into self.state; returns resumed step or None."""
        ckpt = getattr(self, "_ckpt", None)
        if ckpt is None or self.state is None:
            return None
        restored, step = ckpt.restore(jax.device_get(self.state))
        if step is not None:
            self.state = jax.tree_util.tree_map(jnp.asarray, restored)
            print(f"resumed from step checkpoint {step}")
        return step

    # -- export / visualization ---------------------------------------------
    def export(self, output_path: str, example_input=None, mode: Optional[str] = None) -> str:
        """StableHLO export of the trained model.

        Equivalent of the reference trainers' ``export_onnx`` methods
        (``trainers/ctr_trainer.py:189-244``, dual-tower modes at
        ``trainers/match_trainer.py:266-339``): serializes the jitted forward
        (full model, or ``mode in ("user", "item")`` for two-tower models) to
        portable StableHLO plus a params msgpack.

        Args:
            output_path: destination path (``.stablehlo`` appended if absent).
            example_input: representative input pytree defining shapes/dtypes;
                derived from the model's feature schema when omitted.
            mode: ``None`` full model, or ``"user"`` / ``"item"`` tower-only.
        """
        if self.state is None:
            raise RuntimeError("export() requires a trained/initialized model — call fit() first")
        from ..utils.export import StableHLOExporter
        from ..utils.model_utils import generate_dummy_input

        if example_input is None:
            example_input = generate_dummy_input(self.model)
        exporter = StableHLOExporter(self.model, jax.device_get(self.variables()))
        return exporter.export(output_path, example_input, mode=mode)

    def export_quantized(self, output_path: str, example_input=None, mode: Optional[str] = None, quant_mode: str = "int8") -> str:
        """Quantized StableHLO export: int8/fp16 params with in-graph dequant.

        Deployment equivalent of the reference's ``quantize_model`` over the
        exported ONNX (``torch_rechub/utils/quantization.py:26-128``) — the
        serialized artifact holds quantized weights and the graph dequantizes
        them at inference time.
        """
        if self.state is None:
            raise RuntimeError("export_quantized() requires a trained/initialized model — call fit() first")
        from ..utils.export import StableHLOExporter
        from ..utils.model_utils import generate_dummy_input

        if example_input is None:
            example_input = generate_dummy_input(self.model)
        exporter = StableHLOExporter(self.model, jax.device_get(self.variables()))
        return exporter.export_quantized(output_path, example_input, mode=mode, quant_mode=quant_mode)

    def visualization(self, x=None, save_path: Optional[str] = None) -> str:
        """Model architecture summary (reference ``visualization`` methods,
        ``trainers/ctr_trainer.py:246-322``): per-module parameter table with
        shapes and a FLOP estimate; optionally written to ``save_path``.
        """
        from ..utils.model_utils import generate_dummy_input, model_summary

        if x is None:
            x = generate_dummy_input(self.model)
        summary = model_summary(self.model, x=x, variables=self.variables() if self.state is not None else None)
        if save_path:
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
            with open(save_path, "w") as f:
                f.write(summary)
        print(summary)
        return summary

    # -- checkpoints --------------------------------------------------------
    def save(self, name: str = "model.msgpack") -> str:
        return save_checkpoint(self.model_path, self.variables(), name)

    def load(self, name: str = "model.msgpack"):
        restored = load_checkpoint(self.model_path, self.variables(), name)
        self.state = self.state.replace(params=restored["params"], batch_stats=restored.get("batch_stats", self.state.batch_stats))
        return self.state


def to_numpy(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))
