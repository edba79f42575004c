"""Device-mesh helpers.

The reference is single-node and pins Lightning to one device
(reference: train.py:98, SURVEY.md §2.7); its only concurrency is
shared-memory IPC between processes (realtime/recording.py:65-145).  In the
TPU re-design, scale-out is expressed once, here, via ``jax.sharding.Mesh``:
data-parallel batches of recordings/hits shard over the ``data`` axis, model
(tensor) parallel shards over ``model``; XLA inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_shapes: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from the (possibly virtual) device list."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_shapes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    arr = np.array(devices[:n]).reshape(tuple(axis_shapes))
    return Mesh(arr, tuple(axis_names))


def default_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """(data, model) mesh over all available devices by default."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return make_mesh(
        (n // model_parallel, model_parallel), ("data", "model"), devices[:n]
    )
