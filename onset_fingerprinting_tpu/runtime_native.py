"""ctypes bindings for the native host runtime (csrc/libofrt.so).

Native C++ replacements for the reference's host-side native layer
(reference: c/circular_array.h ring buffer; realtime shared-memory transport
recording.py:65-158): a lock-free SPSC ring buffer with monotonic counters
and a paced block executor with per-block latency stats.

Build once: ``make -C csrc`` (done automatically on first import if g++ is
available).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Callable, Optional

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libofrt.so"

_BLOCK_CB = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_void_p,
)


def _load() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ofrt_ring_create.restype = ctypes.c_void_p
    lib.ofrt_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.ofrt_ring_destroy.argtypes = [ctypes.c_void_p]
    for name in ("write_counter", "read_counter", "readable"):
        fn = getattr(lib, f"ofrt_ring_{name}")
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    for name in ("write", "read", "peek_last"):
        fn = getattr(lib, f"ofrt_ring_{name}")
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
    lib.ofrt_executor_create.restype = ctypes.c_void_p
    lib.ofrt_executor_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, _BLOCK_CB,
        ctypes.c_void_p,
    ]
    for name in ("start", "stop", "destroy"):
        getattr(lib, f"ofrt_executor_{name}").argtypes = [ctypes.c_void_p]
    for name in ("blocks", "misses"):
        fn = getattr(lib, f"ofrt_executor_{name}")
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.ofrt_executor_latency_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)
    ]
    return lib


_lib: Optional[ctypes.CDLL] = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class NativeRing:
    """Lock-free SPSC float32 frame ring (native)."""

    def __init__(self, capacity_frames: int, channels: int):
        self._lib = lib()
        self._ptr = self._lib.ofrt_ring_create(capacity_frames, channels)
        self.channels = channels
        self.capacity = capacity_frames

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.ofrt_ring_destroy(self._ptr)
            self._ptr = None

    @property
    def write_counter(self) -> int:
        return self._lib.ofrt_ring_write_counter(self._ptr)

    @property
    def read_counter(self) -> int:
        return self._lib.ofrt_ring_read_counter(self._ptr)

    @property
    def readable(self) -> int:
        return self._lib.ofrt_ring_readable(self._ptr)

    def write(self, frames: np.ndarray) -> int:
        frames = np.ascontiguousarray(frames, dtype=np.float32)
        n = frames.shape[0]
        return self._lib.ofrt_ring_write(
            self._ptr, frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )

    def read(self, n: int) -> Optional[np.ndarray]:
        out = np.empty((n, self.channels), dtype=np.float32)
        got = self._lib.ofrt_ring_read(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out if got == n else None

    def peek_last(self, n: int) -> np.ndarray:
        out = np.empty((n, self.channels), dtype=np.float32)
        self._lib.ofrt_ring_peek_last(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out


class NativeExecutor:
    """Dedicated-thread block executor pulling from a :class:`NativeRing`.

    ``callback(block [B, C] np.ndarray, block_index)`` runs on the executor
    thread; per-block latency stats (µs) and deadline misses versus the
    ``block_size / sample_rate`` budget are tracked natively.
    """

    def __init__(
        self,
        ring: NativeRing,
        block_size: int,
        callback: Callable[[np.ndarray, int], None],
        sample_rate: float = 0.0,
    ):
        self._lib = lib()
        self.ring = ring
        self.block_size = block_size

        def _cb(ptr, frames, channels, idx, _user):
            block = np.ctypeslib.as_array(
                ptr, shape=(frames, channels)
            )
            callback(block, idx)

        self._cb = _BLOCK_CB(_cb)  # keep alive
        self._ptr = self._lib.ofrt_executor_create(
            ring._ptr, block_size, sample_rate, self._cb, None
        )

    def start(self) -> None:
        self._lib.ofrt_executor_start(self._ptr)

    def stop(self) -> None:
        self._lib.ofrt_executor_stop(self._ptr)

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.ofrt_executor_destroy(self._ptr)
            self._ptr = None

    @property
    def blocks_processed(self) -> int:
        return self._lib.ofrt_executor_blocks(self._ptr)

    @property
    def deadline_misses(self) -> int:
        return self._lib.ofrt_executor_misses(self._ptr)

    def latency_stats(self) -> dict:
        out = (ctypes.c_double * 4)()
        self._lib.ofrt_executor_latency_stats(self._ptr, out)
        return {
            "count": int(out[0]),
            "p50_us": out[1],
            "p99_us": out[2],
            "max_us": out[3],
        }
