"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The framework targets TPU; tests exercise numerics and the multi-chip
sharding path on CPU so they run anywhere (SURVEY.md §4: the rebuild adds
CPU-backed jax device tests the reference never had).
"""

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if m and int(m.group(1)) < 8:
    # replace a smaller inherited count — the sharding tests need 8
    flags = flags.replace(
        m.group(0), "--xla_force_host_platform_device_count=8"
    )
    os.environ["XLA_FLAGS"] = flags
elif not m:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (this image's sitecustomize) force-selects itself and
# ignores JAX_PLATFORMS; override explicitly so tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
