"""Localization-stack parity against the reference run LIVE.

Loads the reference's actual ``multilateration.py`` (via tests/ref_harness)
and compares our `core.coords` / `locate` / `ops.xcorr` implementations
against it on identical inputs — the BASELINE.md parity targets "lag
estimates" and "hit coordinates" verified against the reference itself:

- speed_of_sound, coordinate conversions (multilateration.py:23-157)
- lag_map_2d / lag_map_3d feasibility maps (902-1001)
- solve_trilateration[_3d] (170-316) — different solvers (fsolve vs our
  damped Gauss-Newton), compared through the ground truth both recover
- find_lag / find_lag_multi (878-899)
- attenuate_intensity / lag_intensity_map (1018-1101)
- the full streaming Multilaterate3D locator on a shared event stream
  (319-575)
- find_onset_groups from detection.py (131-189)

Skips cleanly without the reference checkout or a C compiler.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import (
    load_multilateration,
    reference_available,
    skip_reason,
)


@pytest.fixture(scope="module")
def ref_ml(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    return load_multilateration(tmp_path_factory.mktemp("refml"))


def test_speed_of_sound_matches(ref_ml):
    from onset_fingerprinting_tpu.core.coords import speed_of_sound

    for medium in ("air", "drumhead"):
        for temp, hum in [(20.0, 0.5), (0.0, 0.0), (35.0, 0.9)]:
            ours = speed_of_sound(
                100, temperature=temp, humidity=hum, medium=medium
            )
            ref = ref_ml.speed_of_sound(
                100, temperature=temp, humidity=hum, medium=medium
            )
            assert ours == pytest.approx(ref, rel=1e-12)


def test_coordinate_conversions_match(ref_ml):
    from onset_fingerprinting_tpu.core import coords

    rng = np.random.default_rng(0)
    for _ in range(16):
        x, y, z = rng.uniform(-10, 10, 3)
        np.testing.assert_allclose(
            [float(v) for v in coords.cartesian_to_polar(x, y)],
            ref_ml.cartesian_to_polar(x, y),
            rtol=1e-5, atol=1e-5,
        )
        r, phi = rng.uniform(0.1, 5), rng.uniform(0, 360)
        np.testing.assert_allclose(
            [float(v) for v in coords.polar_to_cartesian(r, phi)],
            ref_ml.polar_to_cartesian(r, phi),
            rtol=1e-5, atol=1e-5,
        )
        theta = rng.uniform(0, 90)
        np.testing.assert_allclose(
            [float(v) for v in coords.spherical_to_cartesian(r, phi, theta)],
            ref_ml.spherical_to_cartesian(r, phi, theta),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            [float(v) for v in coords.cartesian_to_spherical(x, y, z)],
            ref_ml.cartesian_to_spherical(x, y, z),
            rtol=1e-4, atol=1e-4,
        )


@pytest.mark.parametrize("which", ["2d", "3d"])
def test_lag_maps_match(ref_ml, which):
    """NaN feasibility masks must be identical; sample lags may differ by
    at most 1 where f32 vs f64 rounding lands on opposite sides of a .5
    boundary (the reference computes in f64, ours in f32 on device)."""
    from onset_fingerprinting_tpu.locate.geometry import (
        lag_map_2d,
        lag_map_3d,
    )

    if which == "2d":
        ours = np.asarray(lag_map_2d((15, 0), (-8, 12), d=35.56, sr=96000))
        ref = ref_ml.lag_map_2d((15, 0), (-8, 12), d=35.56, sr=96000)
    else:
        ours = np.asarray(
            lag_map_3d((15, 0, 3), (-8, 12, 3), d=35.56, sr=96000, tol=2)
        )
        ref = ref_ml.lag_map_3d((15, 0, 3), (-8, 12, 3), d=35.56, sr=96000,
                                tol=2)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(np.isnan(ours), np.isnan(ref))
    valid = ~np.isnan(ref)
    diff = np.abs(ours[valid] - ref[valid])
    assert diff.max() <= 1.0
    # rounding-boundary flips must stay rare
    assert (diff > 0).mean() < 0.005


def test_trilateration_matches(ref_ml):
    """fsolve (reference) vs damped Gauss-Newton (ours) on exact TDOAs:
    both must recover the true strike point; agreement bar 0.05 cm (the
    reference's own fsolve xtol is 0.01)."""
    from onset_fingerprinting_tpu.locate.trilateration import (
        solve_trilateration,
        solve_trilateration_3d,
    )

    rng = np.random.default_rng(1)
    sensors2 = [(15.0, 0.0), (-7.5, 13.0), (-7.5, -13.0)]
    sensors3 = [(15.0, 0.0, 2.0), (-7.5, 13.0, 2.0), (-7.5, -13.0, 2.0)]
    n_checked = 0
    for _ in range(12):
        p = rng.uniform(-9, 9, 2)
        if p[0] ** 2 + p[1] ** 2 > 81:
            continue

        def d2(s):
            return float(np.hypot(p[0] - s[0], p[1] - s[1]))

        def d3(s):
            return float(
                np.sqrt((p[0] - s[0]) ** 2 + (p[1] - s[1]) ** 2 + s[2] ** 2)
            )

        guess = np.zeros(2)
        ref2 = ref_ml.solve_trilateration(
            sensors2[1], sensors2[2], sensors2[0],
            d2(sensors2[1]) - d2(sensors2[0]),
            d2(sensors2[2]) - d2(sensors2[0]),
            guess,
        )
        ours2 = solve_trilateration(
            sensors2[1], sensors2[2], sensors2[0],
            d2(sensors2[1]) - d2(sensors2[0]),
            d2(sensors2[2]) - d2(sensors2[0]),
            guess,
        )
        if ref2 is not None:
            assert ours2 is not None
            np.testing.assert_allclose(ref2, p, atol=0.05)
            np.testing.assert_allclose(ours2, ref2, atol=0.05)
            n_checked += 1

        ref3 = ref_ml.solve_trilateration_3d(
            sensors3[1], sensors3[2], sensors3[0],
            d3(sensors3[1]) - d3(sensors3[0]),
            d3(sensors3[2]) - d3(sensors3[0]),
            guess,
        )
        ours3 = solve_trilateration_3d(
            sensors3[1], sensors3[2], sensors3[0],
            d3(sensors3[1]) - d3(sensors3[0]),
            d3(sensors3[2]) - d3(sensors3[0]),
            guess,
        )
        if ref3 is not None:
            assert ours3 is not None
            np.testing.assert_allclose(ours3, ref3, atol=0.05)
            n_checked += 1
    assert n_checked >= 8  # the comparison actually exercised solves


def test_find_lag_matches(ref_ml):
    from onset_fingerprinting_tpu.ops.xcorr import find_lag, find_lag_multi

    rng = np.random.default_rng(2)
    for true_lag in (-37, -3, 0, 5, 61):
        base = rng.normal(0, 1, 256).astype(np.float32)
        a = base
        b = np.roll(base, -true_lag)
        assert find_lag(a, b) == ref_ml.find_lag(a, b)

        lags_ours, heights_ours = find_lag_multi(a, b, top_n=3)
        lags_ref, heights_ref = ref_ml.find_lag_multi(a, b, top_n=3)
        np.testing.assert_array_equal(lags_ours, lags_ref)
        np.testing.assert_allclose(heights_ours, heights_ref, rtol=1e-3)


def test_intensity_functions_match(ref_ml):
    from onset_fingerprinting_tpu.locate.geometry import (
        attenuate_intensity,
        lag_intensity_map,
    )

    i, j = np.meshgrid(np.arange(-5, 6), np.arange(-5, 6))
    mic = np.array([4.0, -3.0, 2.0])
    amp_ref, deg_ref = ref_ml.attenuate_intensity((i, j, 0.0), mic, 0.5, 1.0)
    amp_ours, deg_ours = attenuate_intensity((i, j, 0.0), mic, 0.5, 1.0)
    np.testing.assert_allclose(np.asarray(amp_ours), amp_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(deg_ours), deg_ref, rtol=1e-4)

    lag_ref, sa_ref, sb_ref = ref_ml.lag_intensity_map(
        (15, 0, 3), (-8, 12, 3), d=35.56, sr=96000
    )
    lag_ours, sa_ours, sb_ours = lag_intensity_map(
        (15, 0, 3), (-8, 12, 3), d=35.56, sr=96000
    )
    assert np.abs(np.asarray(lag_ours) - lag_ref).max() <= 1.0
    np.testing.assert_allclose(np.asarray(sa_ours), sa_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sb_ours), sb_ref, atol=1e-3)


def test_find_onset_groups_matches(ref_ml):
    from onset_fingerprinting_tpu.detect.grouping import find_onset_groups

    rng = np.random.default_rng(3)
    onsets, channels = [], []
    t = 0
    for _ in range(20):
        t += int(rng.integers(1500, 6000))
        n_ch = int(rng.integers(1, 4))
        chans = rng.permutation(3)[:n_ch]
        for c in np.sort(chans):
            onsets.append(t + int(rng.integers(0, 120)))
            channels.append(int(c))
    order = np.argsort(onsets, kind="stable")
    onsets = [onsets[k] for k in order]
    channels = [channels[k] for k in order]

    for kwargs in (
        dict(max_distance=256, min_channels=3),
        dict(max_distance=256, min_channels=2),
        dict(max_distance=1000, min_channels=3, close_channel=0),
    ):
        ref = ref_ml.detection.find_onset_groups(onsets, channels, **kwargs)
        ours = find_onset_groups(onsets, channels, **kwargs)
        if ref is None:
            assert ours is None
        else:
            np.testing.assert_array_equal(np.asarray(ours), ref)


def test_multilaterate3d_stream_matches(ref_ml):
    """The full streaming locator: identical (sensor, onset-sample) event
    streams through the reference Multilaterate3D and ours; every completed
    hit must appear in both with matching coordinates (fsolve vs GN bar
    0.1 cm)."""
    from onset_fingerprinting_tpu.core.coords import spherical_to_cartesian
    from onset_fingerprinting_tpu.locate.multilaterate import Multilaterate3D

    sensor_locations = [(0.9, 0.0, 5.0), (0.9, 120.0, 5.0), (0.9, 240.0, 5.0)]
    d_cm = 35.56
    sr = 96000
    kwargs = dict(drum_diameter=d_cm, medium="air", sr=sr)

    ml_ref = ref_ml.Multilaterate3D(sensor_locations, **kwargs)
    ml_ours = Multilaterate3D(sensor_locations, **kwargs)

    # exact arrival-time event stream from known strike points
    radius = d_cm / 2
    sensors = [
        np.array(
            [float(v) for v in spherical_to_cartesian(r * radius, phi, th)]
        )
        for (r, phi, th) in sensor_locations
    ]
    c_cm_s = ml_ref.c  # reference stores cm/s
    rng = np.random.default_rng(4)
    events = []
    t0 = 10000
    hits = []
    for _ in range(8):
        # mid-radius strikes: feasible for every pairing, away from the
        # center's lag-map ambiguity and the edge's legality cutoff
        rr = rng.uniform(0.15, 0.55) * radius
        ang = rng.uniform(0, 2 * np.pi)
        p = np.array([rr * np.cos(ang), rr * np.sin(ang)])
        hits.append(p)
        arrivals = []
        for si, s in enumerate(sensors):
            dist = float(
                np.sqrt((p[0] - s[0]) ** 2 + (p[1] - s[1]) ** 2 + s[2] ** 2)
            )
            arrivals.append((t0 + int(round(dist / c_cm_s * sr)), si))
        arrivals.sort()
        events.extend(arrivals)
        t0 += 48000

    out_ref, out_ours = [], []
    for onset, si in events:
        r = ml_ref.locate(si, onset)
        o = ml_ours.locate(si, onset)
        if r is not None:
            out_ref.append(r)
        if o is not None:
            out_ours.append(o)

    assert len(out_ref) >= 5, "reference located too few hits — bad fixture"
    # our damped-GN solver is at least as robust as the reference's
    # fsolve(maxfev=20): it must locate every hit the reference locates
    # (matching within 0.1 cm), and any EXTRA completions — reference-side
    # solve failures — must still land on a true strike point.
    assert len(out_ours) >= len(out_ref)
    ours_arr = np.asarray(out_ours, dtype=float)
    used = np.zeros(len(out_ours), dtype=bool)
    for r in out_ref:
        dist = np.linalg.norm(ours_arr - np.asarray(r, dtype=float), axis=1)
        dist[used] = np.inf
        k = int(np.argmin(dist))
        assert dist[k] < 0.1, f"reference hit {r} unmatched (best {dist[k]})"
        used[k] = True
    true_arr = np.asarray(hits, dtype=float)
    for k in np.nonzero(~used)[0]:
        d_true = np.linalg.norm(true_arr - ours_arr[k], axis=1).min()
        # arrival times are integer samples: ±0.5 sample ≈ 0.36 cm in air
        # at 96 kHz bounds any located hit's distance from the true strike
        assert d_true < 0.5, (
            f"extra location {ours_arr[k]} not near any true strike"
        )
