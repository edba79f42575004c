"""Native C++ host runtime tests: SPSC ring correctness under threading and
the monotonic-counter invariant (SURVEY.md §5.2), block executor stats."""

import threading
import time

import numpy as np
import pytest

try:
    from onset_fingerprinting_tpu.runtime_native import (
        NativeExecutor,
        NativeRing,
    )
    _AVAILABLE = True
except Exception:  # pragma: no cover
    _AVAILABLE = False

pytestmark = pytest.mark.skipif(
    not _AVAILABLE, reason="native runtime not buildable"
)


class TestNativeRing:
    def test_write_read_round_trip(self, rng):
        ring = NativeRing(1024, 3)
        x = rng.normal(size=(256, 3)).astype(np.float32)
        ring.write(x)
        assert ring.write_counter == 256
        out = ring.read(256)
        np.testing.assert_array_equal(out, x)
        assert ring.read_counter == 256

    def test_read_underflow_returns_none(self):
        ring = NativeRing(64, 1)
        ring.write(np.zeros((10, 1), np.float32))
        assert ring.read(20) is None

    def test_peek_last_wraps(self, rng):
        ring = NativeRing(128, 2)
        x = rng.normal(size=(300, 2)).astype(np.float32)
        for i in range(0, 300, 50):
            ring.write(x[i : i + 50])
        np.testing.assert_array_equal(ring.peek_last(128), x[-128:])

    def test_threaded_spsc_integrity(self, rng):
        """Producer and consumer on separate threads: every consumed frame
        must match what was produced, counters stay monotonic."""
        ring = NativeRing(4096, 2)
        n_total = 128 * 780  # multiple of the consumer's read size
        data = np.arange(n_total * 2, dtype=np.float32).reshape(n_total, 2)
        consumed = []

        def producer():
            i = 0
            while i < n_total:
                chunk = min(256, n_total - i)
                # block if consumer is too far behind to avoid overwrite
                while ring.readable > 4096 - chunk:
                    time.sleep(0)
                ring.write(data[i : i + chunk])
                i += chunk

        def consumer():
            got = 0
            last_rc = 0
            while got < n_total:
                out = ring.read(128)
                if out is None:
                    time.sleep(0)
                    continue
                consumed.append(out.copy())
                got += 128
                assert ring.read_counter >= last_rc
                last_rc = ring.read_counter

        t1 = threading.Thread(target=producer)
        t2 = threading.Thread(target=consumer)
        t1.start(); t2.start()
        t1.join(); t2.join()
        result = np.concatenate(consumed)[:n_total]
        np.testing.assert_array_equal(result, data)


class TestNativeExecutor:
    def test_executes_blocks_and_tracks_latency(self, rng):
        ring = NativeRing(8192, 2)
        seen = []

        def cb(block, idx):
            seen.append((idx, block.copy()))

        ex = NativeExecutor(ring, 128, cb, sample_rate=96000.0)
        ex.start()
        x = rng.normal(size=(128 * 20, 2)).astype(np.float32)
        ring.write(x)
        deadline = time.time() + 5
        while ex.blocks_processed < 20 and time.time() < deadline:
            time.sleep(0.01)
        ex.stop()
        assert ex.blocks_processed >= 20
        stats = ex.latency_stats()
        assert stats["count"] >= 20
        assert stats["p50_us"] >= 0
        idxs = [i for i, _ in seen[:20]]
        assert idxs == list(range(20))
        np.testing.assert_array_equal(
            np.concatenate([b for _, b in seen[:20]]), x[: 128 * 20]
        )
