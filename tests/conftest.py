"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices (the driver separately dry-runs the
multi-chip path). This mirrors the reference's simulated-distributed test
strategy (``/root/reference/tests/test_queue.py``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
