"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via XLA's
host-platform device-count flag — the standard JAX answer to testing
multi-device code on one machine.

Note: this environment preloads an `axon` TPU PJRT plugin via sitecustomize,
which imports jax before any test code runs — so the JAX_PLATFORMS env var
is already consumed. We must use the config API (backends initialize lazily,
so this still wins) plus XLA_FLAGS (also read lazily at backend init).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
