"""Actions Location/Bounds parity against the reference run LIVE (R4).

Loads the reference's actual ``realtime/actions.py`` (pedalboard stubbed —
only the FX duck-type touches it) and compares Bounds containment over a
dense polar grid against our `realtime/actions.py`.

Documented deviation (realtime/actions.py:85-88): for CARTESIAN-constructed
locations the reference normalizes r by |xy| itself, so its r is always
1.0 and r-Bounds never discriminate; ours keeps the raw distance (or the
drum-radius fraction when ``radius`` is given).  The parity grid therefore
uses polar-constructed locations, where the two agree exactly — and one
test PINS the reference's degenerate r (so if the deviation note ever
rots, this fails).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import (
    REF_PKG,
    _dep_stubs,
    _load_standalone,
    load_multilateration,
    reference_available,
    skip_reason,
)


@pytest.fixture(scope="module")
def ref_actions(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    work = tmp_path_factory.mktemp("refactions")
    ml = load_multilateration(work)
    import shutil

    shutil.copy(REF_PKG / "realtime" / "actions.py", work / "actions.py")
    pkg = types.ModuleType("onset_fingerprinting")
    pkg.multilateration = ml
    extra = _dep_stubs()
    extra["onset_fingerprinting"] = pkg
    extra["onset_fingerprinting.multilateration"] = ml
    if "pedalboard" not in sys.modules:
        extra["pedalboard"] = types.ModuleType("pedalboard")
    return _load_standalone("_ref_actions", work / "actions.py", extra)


BOUNDS_CASES = [
    dict(r=(0.2, 0.8)),
    dict(phi=(30, 120)),
    dict(phi=(300, 60)),  # wrapping
    dict(r=(0.1, 0.9), phi=(270, 90)),
    dict(x=(-0.5, 0.5), y=(0.0, 1.0)),
    dict(x=(0.3, -0.3), r=(0.0, 0.7), phi=(45, 315)),
]


def test_bounds_containment_matches(ref_actions):
    from onset_fingerprinting_tpu.realtime.actions import Bounds, Location

    rs = np.linspace(0.05, 1.1, 9)
    # off-axis angles: at phi=90/180/270 the tiny f32-vs-f64 rounding of
    # sin/cos flips the SIGN of a ~1e-17 coordinate, which a closed bound
    # at exactly 0.0 turns into a containment flip — a float edge, not a
    # semantic difference
    phis = np.arange(0, 360, 22.5) + 11.25
    n_in = 0
    for case in BOUNDS_CASES:
        b_ref = ref_actions.Bounds(**case)
        b_ours = Bounds(**case)
        for r in rs:
            for phi in phis:
                loc_ref = ref_actions.Location(r=float(r), phi=float(phi))
                loc_ours = Location(r=float(r), phi=float(phi))
                assert (loc_ours in b_ours) == (loc_ref in b_ref), (
                    f"{case} disagrees at r={r} phi={phi}"
                )
                n_in += loc_ours in b_ours
    assert n_in > 50  # the grid actually lands inside bounds


def test_location_polar_roundtrip_matches(ref_actions):
    from onset_fingerprinting_tpu.realtime.actions import Location

    for r, phi in [(0.5, 0.0), (0.8, 123.0), (1.0, 359.0)]:
        ours = Location(r=r, phi=phi)
        ref = ref_actions.Location(r=r, phi=phi)
        assert ours.x == pytest.approx(ref.x, abs=1e-6)
        assert ours.y == pytest.approx(ref.y, abs=1e-6)


def test_value_in_parameter_range_is_superseded():
    """The reference's dict-of-ranges FX quantizer (actions.py:26-48) is
    deliberately replaced by the continuous ParameterMapper
    (realtime/actions.py:144-170) — assert the replacement exists so the
    deviation stays documented and discoverable."""
    from onset_fingerprinting_tpu.realtime.actions import ParameterMapper

    pm = ParameterMapper("r", ["gain"], (0.0, 1.0), [(10.0, 30.0)])
    assert (pm(0.0)[0], pm(1.0)[0]) == (10.0, 30.0)


def test_reference_cartesian_r_is_degenerate(ref_actions):
    """Pins the deviation note: the reference's cartesian-constructed r is
    always 1.0 (it normalizes by |xy| itself, actions.py:172-174), while
    ours keeps the discriminating distance."""
    from onset_fingerprinting_tpu.realtime.actions import Location

    ref = ref_actions.Location(x=0.3, y=0.4)
    assert ref.r == pytest.approx(1.0)
    ours = Location(x=0.3, y=0.4)
    assert ours.r == pytest.approx(0.5)
    # angles still agree (ours computes in f32 on device: ~1e-5 deg)
    assert ours.phi == pytest.approx(ref.phi, abs=1e-3)
