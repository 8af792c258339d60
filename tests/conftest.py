"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding (mesh/pjit/shard_map) is validated on host-simulated
devices — set env vars before anything imports jax.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform: unit
# tests need hermetic fp32 math and 8 virtual devices for sharding tests.
# The environment's sitecustomize registers the TPU backend at interpreter
# start and overrides JAX_PLATFORMS, so we must go through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This image's XLA-CPU backend executes fp32 matmuls at reduced precision by
# default (~1e-2 error on O(1) dots); parity tests need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
