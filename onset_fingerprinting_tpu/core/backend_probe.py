"""Hang-proof accelerator backend probes.

``jax.devices()`` does not merely *raise* when an accelerator plugin's
transport is broken — it can BLOCK indefinitely (observed live: a wedged
axon-tunnel TPU plugin hangs backend init forever).  The only safe probe
is a THROWAWAY subprocess under a hard timeout: if the child hangs, it is
killed and this process never initializes the broken backend.

This module must stay importable without touching jax (no jax import here;
``tests/test_hermetic.py`` guards the package against import-time backend
init).  Used by ``bench.py`` (await-with-retry before benchmarking) and
``__graft_entry__.py`` (single probe before the multichip dryrun).
"""

from __future__ import annotations

import subprocess
import sys
import time
from typing import Callable

_PROBE_CODE = "import jax; print(len(jax.devices()))"


def probe_device_count(
    timeout: float = 120.0, code: str = _PROBE_CODE
) -> tuple[int, str]:
    """Ask a throwaway subprocess how many jax devices come up.

    :param timeout: hard kill budget for the child (a wedged transport
        blocks forever; the child is killed and counted as 0 devices)
    :param code: probe script; must print the device count as its last
        stdout line
    :returns: ``(device_count, diagnostic)`` — count 0 with a one-line
        reason on failure, hang, or crash
    """
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return 0, f"probe hung >{timeout:.0f}s (wedged transport?)"
    except Exception as e:  # pragma: no cover - exec environment failure
        return 0, f"probe failed to launch: {type(e).__name__}: {e}"
    if out.returncode == 0 and out.stdout.strip():
        try:
            return int(out.stdout.strip().splitlines()[-1]), "ok"
        except ValueError:
            pass
    err = out.stderr.strip().splitlines()
    return 0, err[-1] if err else f"probe exit {out.returncode}, no output"


def await_healthy_backend(
    max_wait_s: float,
    probe_timeout: float = 120.0,
    log: Callable[[str], None] | None = None,
) -> bool:
    """Retry :func:`probe_device_count` until healthy or out of budget.

    A wedged tunnel often recovers once the server-side job blocking it
    finishes, so retry roughly once a minute up to ``max_wait_s``.
    Returns True once a probe reports >= 1 device, False when the wait
    budget runs out — the caller records a clean failure instead of a hang.
    """
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        n, diag = probe_device_count(probe_timeout)
        if n > 0:
            return True
        if log is not None:
            log(f"backend probe {attempt} failed: {diag}")
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        time.sleep(min(max(60 - (time.monotonic() - t0), 5), remaining))
