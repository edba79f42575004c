"""Numerical parity against the REFERENCE's own compiled C kernels.

The suite's other golden tests compare against independently written
numpy/scipy models.  This module closes the loop on the north-star parity
target (BASELINE.md: "onset indices, lag estimates ... match reference CPU
goldens") by compiling the reference's actual C source
(reference: onset_fingerprinting/envelope_follower.c:6-85) at test time and
driving it through ctypes — the same binary the reference's detector calls
(detection.py:504-592) — then checking our lax.scan ops reproduce it.

Float comparisons are tolerance-based, not bitwise: gcc and XLA schedule
the same f32 arithmetic differently (FMA contraction), so we compile with
``-ffp-contract=off`` and compare to ~1e-6.  The backtracking walk's
integer outputs (onset deltas) are compared exactly on data whose
decisions carry decisive margins.

Skips cleanly when the reference checkout or a C compiler is unavailable
(the suite stays hermetic).
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_REF_SRC = Path("/root/reference/onset_fingerprinting/envelope_follower.c")


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory):
    if not _REF_SRC.exists():
        pytest.skip("reference checkout not available")
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler available")
    out = tmp_path_factory.mktemp("refc") / "envelope_follower.so"
    # -O2 -ffp-contract=off: keep IEEE f32 op-for-op semantics (no fast-math
    # reassociation, no FMA contraction) so the comparison tests the
    # algorithm, not the compiler's scheduling
    subprocess.run(
        [cc, "-shared", "-fPIC", "-O2", "-ffp-contract=off",
         "-o", str(out), str(_REF_SRC), "-lm"],
        check=True,
        capture_output=True,
    )
    lib = ctypes.CDLL(str(out))
    lib.ar_envelope.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.minmax_envelope.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.backtrack_onsets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_float, ctypes.c_float,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
    ]
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _lptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def test_ar_envelope_matches_reference_binary(ref_lib):
    """ops/envelope.py::ar_envelope vs envelope_follower.c:6-25.

    The C kernel streams through a reused [T, C] output buffer: the j=0
    step reads its initial state from the buffer's LAST row (the previous
    block's final envelope), so the last row of ``y`` seeds the recurrence.
    """
    from onset_fingerprinting_tpu.ops.envelope import ar_envelope

    rng = np.random.default_rng(0)
    t, c = 512, 3
    x = rng.normal(0.0, 1.0, (t, c)).astype(np.float32)
    y0 = rng.normal(0.0, 0.5, (c,)).astype(np.float32)
    attack, release = 1.0 / 3.0, 1.0 / 383.0  # detection.py:513-514 scale

    y_ref = np.zeros((t, c), dtype=np.float32)
    y_ref[-1] = y0  # j=0 reads prev from the last row
    ref_lib.ar_envelope(
        _fptr(x), _fptr(y_ref),
        ctypes.c_float(attack), ctypes.c_float(release),
        ctypes.c_int(c), ctypes.c_int(t),
    )

    y_jax = np.asarray(ar_envelope(x, y0, attack, release))
    np.testing.assert_allclose(y_jax, y_ref, rtol=1e-6, atol=1e-6)


def test_minmax_envelope_matches_reference_binary(ref_lib):
    """ops/envelope.py::minmax_envelope vs envelope_follower.c:27-57."""
    from onset_fingerprinting_tpu.ops.envelope import (
        MinMaxState,
        minmax_envelope,
    )

    rng = np.random.default_rng(1)
    t, c = 2048, 4
    # dB-like signal wandering across the tracker's band, incl. dips below
    # the minmin floor so every branch of the kernel executes
    x = (20.0 * np.abs(np.cumsum(rng.normal(0, 0.2, (t, c)), axis=0) / 8.0)
         - 5.0).astype(np.float32)
    mins0 = np.full((c,), 0.0, dtype=np.float32)
    maxs0 = np.full((c,), 10.0, dtype=np.float32)
    alpha_min, alpha_max, minmin = 1e-4, 1e-5, 0.0

    mins_ref = mins0.copy()
    maxs_ref = maxs0.copy()
    ref_lib.minmax_envelope(
        _fptr(x), _fptr(mins_ref), _fptr(maxs_ref),
        ctypes.c_float(alpha_min), ctypes.c_float(alpha_max),
        ctypes.c_float(minmin), ctypes.c_int(t), ctypes.c_int(c),
    )

    st = minmax_envelope(
        x, MinMaxState(mins0, maxs0), alpha_min, alpha_max, minmin
    )
    # 2048 chained f32 EMA steps accumulate ~4e-6 relative drift between
    # gcc's and XLA's rounding schedules; the algorithmic bar is 1e-5
    np.testing.assert_allclose(
        np.asarray(st.min_val), mins_ref, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st.max_val), maxs_ref, rtol=1e-5, atol=1e-6
    )


def test_backtrack_matches_reference_binary(ref_lib):
    """detect/amplitude.py::_backtrack vs envelope_follower.c:59-85.

    One onset per channel at varying in-block offsets over a shared ring
    buffer; the walk's stopping decisions carry decisive margins (steps
    well above ``tol``), so the integer deltas must match exactly.
    """
    from onset_fingerprinting_tpu.detect.amplitude import _Static, _backtrack

    rng = np.random.default_rng(2)
    n, c, block = 128, 4, 32
    alpha, tol = 0.2, 1e-4

    # per channel: noise floor, then a clear dip into the onset (monotone
    # decrease toward the hit, then the attack ramps up at the buffer end)
    buf = rng.normal(5.0, 0.02, (n, c)).astype(np.float32)
    dip_lens = [10, 17, 4, 25]
    for ch, dl in enumerate(dip_lens):
        ramp = np.linspace(5.0, 1.0, dl, dtype=np.float32)
        buf[n - dl - 6 : n - 6, ch] = ramp
        buf[n - 6 :, ch] = np.linspace(1.0, 30.0, 6, dtype=np.float32)

    deltas0 = np.array([4, 2, 5, 1], dtype=np.int64)
    channels = np.arange(c, dtype=np.int64)

    deltas_ref = deltas0.copy()
    ref_lib.backtrack_onsets(
        _fptr(buf), _lptr(channels), _lptr(deltas_ref),
        ctypes.c_float(alpha), ctypes.c_float(tol),
        ctypes.c_long(n), ctypes.c_long(c), ctypes.c_long(c),
        ctypes.c_long(block),
    )

    static = _Static(
        n_channels=c, block_size=block, floor=-70.0,
        fast_attack=1 / 3, fast_release=1 / 383,
        slow_attack=1 / 2205, slow_release=1 / 2205,
        cooldown=1323, manual=False, use_hipass=False,
        backtrack=True, bt_size=n, bt_alpha=alpha, bt_tol=tol,
        alpha_min=1e-4, alpha_max=1e-5, minmin=0.0,
    )
    import jax.numpy as jnp

    deltas_jax = np.asarray(
        _backtrack(static, jnp.asarray(buf), jnp.asarray(deltas0, jnp.int32))
    )
    assert deltas_jax.tolist() == deltas_ref.tolist()
    # sanity: the walk actually moved (the test would pass vacuously if
    # no channel backtracked at all)
    assert (deltas_ref < deltas0).any()
