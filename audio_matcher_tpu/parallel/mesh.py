"""Device-mesh helpers for multi-chip sharding.

The reference's only compute parallelism is a rayon thread pool over chunks
(SURVEY.md §2.17); the TPU-native counterpart is SPMD over a
``jax.sharding.Mesh``: episodes shard over the ``data`` axis and each
episode's overlap-save windows shard over the ``seq`` axis (window
materialization makes the halo explicit, so the "sequence parallelism" is
embarrassingly parallel — SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, str] = ("data", "seq"),
) -> Mesh:
    """Create a 2D (data × seq) mesh over available devices.

    Prefers a wide ``data`` axis (episode parallelism dominates the archive
    sweep) with ``seq`` = 1 or 2.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    seq = 2 if n % 2 == 0 and n >= 4 else 1
    data = n // seq
    dev_grid = np.array(devices[: data * seq]).reshape(data, seq)
    return Mesh(dev_grid, axis_names)
