"""Model export: StableHLO serialization + weight-only quantization.

The reference exports to ONNX with full/user-tower/item-tower modes
(``torch_rechub/utils/onnx_export.py:79-301``) and quantizes via onnxruntime
(``utils/quantization.py:26-128``).  The TPU-native equivalents:

- ``StableHLOExporter``: ``jax.export`` serializes the jitted forward (full
  model or a single tower) to portable StableHLO bytes + a params msgpack;
  round-trips through ``load_exported`` and runs on any JAX backend.
- ``quantize_params`` / ``dequantize_params``: int8 weight-only (per-output-
  channel symmetric scales) or fp16 parameter casting — the deployment-size
  story without an ONNX dependency.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


class StableHLOExporter:
    """Serialize a model's jitted forward to StableHLO + params.

    Args:
        model: a flax module following this framework's call conventions.
        variables: trained variables dict (``{"params": ..., ...}``).
    """

    # per-batch transient collections created by the sparse-grad hooks at
    # init; never part of an inference artifact
    _TRANSIENT = ("perturbations", "embedding_ids", "intermediates")

    def __init__(self, model, variables: Dict):
        variables = {k: v for k, v in variables.items() if k not in self._TRANSIENT}
        self.model = model
        self.variables = variables

    def _forward(self, mode: Optional[str]):
        model = self.model

        if mode in ("user", "item"):

            def fn(variables, x):
                return model.apply(variables, x, training=False, mode=mode)

        else:

            def fn(variables, x):
                return model.apply(variables, x, training=False)

        return fn

    def export(self, output_path: str, example_input, mode: Optional[str] = None) -> str:
        """Export to ``<output_path>.stablehlo`` (+ ``.params.msgpack``).

        Args:
            example_input: a representative input pytree (defines shapes/dtypes).
            mode: ``None`` full model; ``"user"``/``"item"`` tower-only export
                for two-tower models (reference dual-tower ONNX export modes).
        """
        return self._export(output_path, example_input, self._forward(mode), self.variables)

    def export_quantized(self, output_path: str, example_input, mode: Optional[str] = None, quant_mode: str = "int8") -> str:
        """Export a *quantized* inference artifact with dequantization in-graph.

        The deployed equivalent of the reference's quantize-the-ONNX-model flow
        (``torch_rechub/utils/quantization.py:26-128``): the serialized params
        are int8 (+ per-channel f32 scales) or fp16 — the on-disk/HBM artifact
        actually shrinks — and the traced StableHLO graph starts with the
        dequant ops, so ``load_exported`` runs the quantized artifact directly.
        """
        qvariables = dict(self.variables)
        qvariables["params"] = quantize_params(jax.device_get(self.variables["params"]), quant_mode)
        forward = self._forward(mode)

        def fn(qvars, x):
            variables = dict(qvars)
            variables["params"] = dequantize_params(variables["params"])
            return forward(variables, x)

        return self._export(output_path, example_input, fn, qvariables)

    @staticmethod
    def _export(output_path: str, example_input, fn: Callable, variables) -> str:
        from jax import export as jax_export

        spec = lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape, np.asarray(a).dtype)
        x_spec = jax.tree_util.tree_map(spec, example_input)
        v_spec = jax.tree_util.tree_map(spec, variables)
        exported = jax_export.export(jax.jit(fn))(v_spec, x_spec)
        blob = exported.serialize()
        base = output_path
        if base.endswith(".stablehlo"):
            base = base[: -len(".stablehlo")]
        os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
        with open(base + ".stablehlo", "wb") as f:
            f.write(blob)
        with open(base + ".params.msgpack", "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(variables)))
        return base + ".stablehlo"


def load_exported(path: str):
    """Load a StableHLO export; returns ``(callable(x), variables)``.

    The callable binds the saved parameters and accepts the input pytree.
    """
    from jax import export as jax_export

    base = path[: -len(".stablehlo")] if path.endswith(".stablehlo") else path
    with open(base + ".stablehlo", "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(base + ".params.msgpack", "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())

    def run(x):
        return exported.call(variables, x)

    return run, variables


# ---------------------------------------------------------------------------
# Weight-only quantization
# ---------------------------------------------------------------------------


def _is_quantizable(path_str: str, leaf) -> bool:
    return hasattr(leaf, "ndim") and leaf.ndim == 2 and "batchnorm" not in path_str.lower()


def quantize_params(params, mode: str = "int8"):
    """Quantize a parameter pytree for deployment.

    ``int8``: 2-D weights become ``{"q": int8, "scale": f32 per-out-channel}``;
    other leaves stay f32.  ``fp16``: every float leaf cast to float16.
    """
    if mode == "fp16":
        return jax.tree_util.tree_map(lambda a: a.astype(jnp.float16) if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    if mode != "int8":
        raise ValueError("mode must be 'int8' or 'fp16'")

    def one(path, leaf):
        if not _is_quantizable(jax.tree_util.keystr(path), leaf):
            return leaf
        a = np.asarray(leaf, dtype=np.float32)
        scale = np.maximum(np.abs(a).max(axis=0), 1e-12) / 127.0  # per output channel
        q = np.clip(np.round(a / scale[None, :]), -127, 127).astype(np.int8)
        return {"q": q, "scale": scale.astype(np.float32)}

    return jax.tree_util.tree_map_with_path(one, params)


def dequantize_params(qparams):
    """Inverse of ``quantize_params`` (int8 or fp16)."""

    def is_q(x):
        return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}

    def one(leaf):
        if is_q(leaf):
            return jnp.asarray(leaf["q"], jnp.float32) * jnp.asarray(leaf["scale"])[None, :]
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float16:
            return jnp.asarray(leaf, jnp.float32)
        return leaf

    return jax.tree_util.tree_map(one, qparams, is_leaf=is_q)


def quantization_error(params, mode: str = "int8") -> float:
    """Max relative reconstruction error over quantized leaves (sanity metric)."""
    deq = dequantize_params(quantize_params(params, mode))
    errs = []
    for (p1, a), (_p2, b) in zip(jax.tree_util.tree_flatten_with_path(params)[0], jax.tree_util.tree_flatten_with_path(deq)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.maximum(np.abs(a).max(), 1e-12)
        errs.append(float(np.abs(a - b).max() / denom))
    return max(errs) if errs else 0.0
