"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The framework targets TPU; tests exercise numerics and the multi-chip
sharding path on CPU so they run anywhere (SURVEY.md §4: the rebuild adds
CPU-backed jax device tests the reference never had).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
