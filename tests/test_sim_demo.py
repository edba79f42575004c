"""Hermetic smoke of the realtime sim demo's acceptance gates.

Runs examples/realtime_sim_demo.py as a subprocess on the CPU backend at
true realtime pacing for a short stream.  The demo's own gates apply
(>=95% of hits located, median error <= 1 cm, zone-classifier accuracy
>= 0.8, zero drops / harvest overflows, end-to-end latency backlog bound);
the <1 ms north-star device gate and the audio-thread budget are
TPU-transport measurements and are skipped on --cpu by the demo itself.
A Python-level regression in the serve loop can therefore no longer reach
a TPU round-end run undetected.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_realtime_sim_demo_cpu_smoke():
    env = os.environ.copy()
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, str(REPO / "examples" / "realtime_sim_demo.py"),
         "--cpu", "--seconds", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    out = res.stdout + res.stderr
    assert res.returncode == 0, out[-3000:]
    assert "PASS" in res.stdout, out[-3000:]
