"""Ring buffers.

Two flavours:

- :class:`RingBuffer` — an immutable JAX pytree holding a fixed-size ring of
  frames plus a monotonically increasing write counter.  All updates are
  functional (``ring_write`` returns a new pytree) and fully jittable, so a
  ring buffer can live in HBM and be threaded through ``lax.scan`` streaming
  pipelines.  This is the TPU-native equivalent of the reference's C circular
  array (reference: onset_fingerprinting/c/circular_array.h:9-141) and of the
  loopmate ``CircularArray`` the reference imports (detection.py:7).

- :class:`CircularArray` — a host-side numpy implementation with the same
  negative-relative indexing semantics, used by host tooling, the realtime
  host shim, and tests.  Rebuilt natively because the reference's loopmate
  dependency is not vendored (reference pyproject.toml:18-37).

Indexing convention (shared by both): index ``-k`` refers to the ``k``-th most
recently written frame; slices are relative to the total number of frames ever
written (``counter``), exactly like loopmate's ``query_circular``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class RingBuffer:
    """Functional ring buffer pytree.

    Attributes:
        data: ``[N, ...]`` ring storage; axis 0 is the ring axis.
        counter: scalar int32/int64 — total frames written since creation.
    """

    def __init__(self, data: jnp.ndarray, counter: jnp.ndarray):
        self.data = data
        self.counter = counter

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def tree_flatten(self):
        return (self.data, self.counter), None

    @classmethod
    def tree_unflatten(cls, aux: Any, children):
        return cls(*children)

    def __repr__(self):
        return f"RingBuffer(capacity={self.data.shape[0]}, counter={self.counter})"


def ring_init(capacity: int, shape: tuple = (), dtype=jnp.float32) -> RingBuffer:
    """Create an empty ring buffer of ``capacity`` frames of ``shape``."""
    return RingBuffer(
        jnp.zeros((capacity,) + tuple(shape), dtype=dtype),
        jnp.zeros((), dtype=jnp.int32),
    )


def ring_write(rb: RingBuffer, block: jnp.ndarray) -> RingBuffer:
    """Write a ``[B, ...]`` block of frames, wrapping around. Jittable.

    Equivalent of circular_array.h:52-69 (``write_circular_array_multi``),
    expressed as a scatter so XLA keeps everything on-device.
    """
    n = rb.capacity
    b = block.shape[0]
    start = jnp.mod(rb.counter, n)
    idx = jnp.mod(start + jnp.arange(b, dtype=rb.counter.dtype), n)
    data = rb.data.at[idx].set(block.astype(rb.data.dtype))
    return RingBuffer(data, rb.counter + b)


def ring_read_last(rb: RingBuffer, n: int) -> jnp.ndarray:
    """Return the last ``n`` frames in chronological order. Jittable.

    ``n`` must be a static int ≤ capacity.  Frames never written read as the
    initial fill (zeros from :func:`ring_init`).
    """
    cap = rb.capacity
    idx = jnp.mod(rb.counter - n + jnp.arange(n, dtype=rb.counter.dtype), cap)
    return rb.data[idx]


def ring_slice(rb: RingBuffer, start: int, stop: int) -> jnp.ndarray:
    """Relative slice ``[start:stop]`` where negative values count back from
    the write head.  ``stop - start`` must be static. Jittable."""
    length = stop - start
    cap = rb.capacity
    idx = jnp.mod(
        rb.counter + start + jnp.arange(length, dtype=rb.counter.dtype), cap
    )
    return rb.data[idx]


def query_circular(
    data: np.ndarray, key: slice, counter: int, axis: int = 0
) -> np.ndarray:
    """Host-side relative slice into raw circular storage.

    Mirrors loopmate's ``query_circular`` helper used by the reference's
    analysis workers (realtime/recording.py:7,410-411): ``key`` is a slice
    with negative (relative-to-now) bounds, ``counter`` the write cursor.
    """
    n = data.shape[axis]
    start = key.start if key.start is not None else -n
    stop = key.stop if key.stop is not None else 0
    idx = (np.arange(start, stop) + counter) % n
    return np.take(data, idx, axis=axis)


class CircularArray:
    """Host-side (numpy) circular array with relative indexing.

    API mirrors the loopmate primitive the reference builds on: ``write``
    advances the counter, ``arr[-k:]`` reads the most recent ``k`` frames,
    ``counter`` counts total frames written.  ``data`` may be external shared
    storage (e.g. a shared-memory view) — this class never reallocates it.
    """

    def __init__(self, data: np.ndarray, axis: int = 0):
        self.data = data
        self.axis = axis
        self.N = data.shape[axis]
        self.counter = 0
        self.write_counter = 0

    def write(self, block: np.ndarray) -> None:
        b = block.shape[self.axis]
        start = self.write_counter % self.N
        idx = (start + np.arange(b)) % self.N
        if self.axis == 0:
            self.data[idx] = block
        else:
            np.put_along_axis(
                self.data,
                np.expand_dims(
                    idx, tuple(i for i in range(self.data.ndim) if i != self.axis)
                ),
                block,
                axis=self.axis,
            )
        self.write_counter += b
        self.counter += b

    def __getitem__(self, key) -> np.ndarray:
        if isinstance(key, slice):
            return query_circular(self.data, key, self.counter, self.axis)
        if isinstance(key, int):
            return query_circular(
                self.data, slice(key, key + 1 if key != -1 else None),
                self.counter, self.axis,
            ).squeeze(self.axis)
        raise TypeError(f"Unsupported index {key!r}")

    def elements_since(self, abs_counter: int) -> int:
        """Number of frames written since an absolute counter snapshot."""
        return self.counter - abs_counter

    def index_offset(self, offset: int) -> int:
        """Physical index of the frame ``offset`` frames from the cursor."""
        return (self.counter + offset) % self.N

    def rearrange(self) -> np.ndarray:
        """Return contents linearized to chronological order (copy)."""
        return self[-self.N:]
