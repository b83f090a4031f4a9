"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via XLA's
host-platform device-count flag — the standard JAX answer to testing
multi-device code on one machine.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times sane for tiny test shapes.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
