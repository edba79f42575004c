"""Real-pod multi-process initialization and global meshes.

The reference's only "distributed backend" is single-host shared-memory IPC
(reference: realtime/recording.py:133-145; SURVEY.md §5.8).  Scaling the
offline pipelines (fleet mining, training) beyond one chip instead uses the
TPU-native stack: ``jax.distributed`` for multi-process/multi-host runs, a
global :class:`jax.sharding.Mesh` over all pod devices, and XLA collectives
(``all_gather``/``psum`` via ``shard_map``) riding ICI/DCN — see
:func:`sharding.detect_events_time_sharded` for the event-aggregation path.

On a real pod, call :func:`init_distributed` once at process start (before
any device use); single-process runs are a no-op, so the same entry points
work from a laptop, one chip, or a pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_POD_ENV_MARKERS = (
    # set by the user / launcher for explicit multi-process runs
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    # explicit opt-in for pod runtimes whose auto-detect markers
    # (TPU_WORKER_HOSTNAMES etc.) can't be trusted as multi-process proof —
    # single-chip tunnels set them too
    "OFT_DISTRIBUTED",
)

_initialized = False


def pod_env_detected() -> bool:
    """True when environment markers indicate a multi-process pod launch."""
    return any(os.environ.get(k) for k in _POD_ENV_MARKERS)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Initialize ``jax.distributed`` for a multi-process run.

    - With explicit arguments, always initializes.
    - With no arguments, initializes only when pod environment markers are
      present (``jax.distributed.initialize()`` then auto-detects the
      topology); otherwise it is a NO-OP so single-process runs (tests, one
      tunneled chip) use the same code path.

    Returns True iff the process is part of a multi-process run afterwards.
    Idempotent: safe to call from every entry point.
    """
    global _initialized
    import jax

    explicit = coordinator_address is not None
    if _initialized:
        return jax.process_count() > 1
    if not explicit and not pod_env_detected():
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    return jax.process_count() > 1


def global_mesh(
    axis_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
):
    """Mesh over ALL devices of the (possibly multi-process) run.

    Default: one flat ``data`` axis over ``jax.devices()`` — which spans
    every process after :func:`init_distributed`.  Multi-axis shapes must
    multiply to the device count.
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if axis_shape is None:
        axis_shape = (len(devices),)
    n = int(np.prod(axis_shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(axis_shape)} needs {n} devices, "
            f"have {len(devices)}"
        )
    return Mesh(
        np.asarray(devices[:n]).reshape(tuple(axis_shape)), tuple(axis_names)
    )
