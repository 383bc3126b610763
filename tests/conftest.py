"""Test harness: run everything on a virtual 8-device CPU mesh.

TPU hardware is not required for correctness tests — SPMD sharding is
validated on host-platform virtual devices, exactly as the driver's
``dryrun_multichip`` does.  These env vars must be set before jax imports.
"""

import os

# The environment presets JAX_PLATFORMS=axon (real TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late.  Backends initialize lazily, so switching the platform via
# jax.config before any device is touched still works.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2022)


def synthetic_ctr_frame(n=512, n_sparse=5, n_dense=5, vocab=64, seed=2022):
    """Small random CTR dataset matching the reference e2e test pattern
    (``/root/reference/tests/test_e2e_ranking.py:22-107``)."""
    rng = np.random.default_rng(seed)
    x = {f"C{i}": rng.integers(0, vocab, n).astype(np.int32) for i in range(n_sparse)}
    x.update({f"I{i}": rng.normal(size=n).astype(np.float32) for i in range(n_dense)})
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


@pytest.fixture
def ctr_data():
    return synthetic_ctr_frame()
