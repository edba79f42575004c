"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite is hermetic and multi-chip sharding paths are exercised without TPUs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# jax is preloaded at interpreter start (axon sitecustomize), so env vars are
# too late — but backend init is lazy: restricting platforms via config here
# makes the suite CPU-only and fully independent of the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
