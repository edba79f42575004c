"""Hermetic smoke of the driver benchmark (bench.py) at tiny width.

The driver runs ``python bench.py`` on real TPU hardware at the end of
every round; a Python-level regression there costs the round's headline
artifact.  This runs the WHOLE bench path (detector build + fallback,
fingerprinter, correctness gate, JSON emission) on the suite's CPU
backend — which also exercises the pallas→XLA-scan fallback, since the
CPU backend rejects non-interpret pallas_call at first compile.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_bench_cpu_smoke(monkeypatch, capsys):
    monkeypatch.setenv("OFPTPU_BENCH_PROBE_WAIT", "0")  # backend is live
    monkeypatch.setenv("OFPTPU_BENCH_STREAMS", "2")
    monkeypatch.setenv("OFPTPU_BENCH_CHUNKS", "1")
    monkeypatch.setenv("OFPTPU_BENCH_CONV", "conv")  # skip Mosaic compile

    import bench

    rc = bench.main()
    out = capsys.readouterr().out
    assert rc == 0, f"bench.main() rc={rc}\n{out}"
    line = json.loads(out.strip().splitlines()[-1])
    assert line["metric"] == "detect_fingerprint_realtime_factor_per_chip"
    assert line["correctness_ok"] is True
    assert line["recall"] == 1.0 and line["precision"] == 1.0
    assert line["value"] > 0
