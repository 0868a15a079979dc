import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (the driver separately dry-runs the multichip path).
# Force CPU: the ambient environment may point JAX_PLATFORMS at the tunneled
# TPU, whose default bf16 matmul precision would break fp32 parity tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-sets jax_platforms at import time, overriding the
# env var; override it back so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
