"""Localization tests: synthetic-geometry round trips (SURVEY §4 strategy:
generate hits at known locations → lag maps → locate must recover them;
calibration must recover perturbed sensor positions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core.coords import (
    polar_to_cartesian,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.locate import (
    Multilaterate,
    Multilaterate3D,
    MultilateratePaired,
    calibrate,
    calibration_locations,
    lag_map_2d,
    lag_map_3d,
    optimize_positions,
    solve_trilateration,
    solve_trilateration_3d,
    train_location_model,
    trilaterate_batch,
)
from onset_fingerprinting_tpu.locate.multilaterate import (
    locator_init,
    make_locate_update,
)

SR = 96000
DIAM = 14 * 2.54


def sensors_3d(radius):
    polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
    xyz = [
        tuple(float(v) for v in spherical_to_cartesian(r * radius, phi, th))
        for (r, phi, th) in polar
    ]
    return polar, xyz


def lags_for_point(x, y, xyz, c, sr):
    d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
    samples = [di / c * sr for di in d]
    return samples


class TestLagMaps:
    def test_zero_on_perpendicular_bisector(self):
        lm = np.asarray(lag_map_2d((-5.0, 0.0), (5.0, 0.0), d=DIAM, sr=SR,
                                   medium="drumhead"))
        r = lm.shape[0] // 2
        # points equidistant from both mics → lag 0 along x=0 column
        assert lm[r, r] == 0
        assert np.nanmax(np.abs(lm[:, r])) <= 1

    def test_nan_outside_circle(self):
        lm = np.asarray(lag_map_2d((0.0, 0.0), (5.0, 0.0), d=DIAM, sr=SR))
        assert np.isnan(lm[0, 0])  # corner is outside the drum circle

    def test_3d_matches_2d_at_zero_height(self):
        lm2 = np.asarray(lag_map_2d((-5.0, 0.0), (5.0, 0.0), d=DIAM, sr=SR,
                                    medium="drumhead", tol=1))
        lm3 = np.asarray(
            lag_map_3d((-5.0, 0.0, 0.0), (5.0, 0.0, 0.0), d=DIAM, sr=SR,
                       medium="drumhead", tol=1)
        )
        # grid radii differ by construction (2D: round(d/2); 3D: round(d)//2)
        k = (min(lm2.shape[0], lm3.shape[0])) // 2
        c2, c3 = lm2.shape[0] // 2, lm3.shape[0] // 2
        a = lm2[c2 - k : c2 + k + 1, c2 - k : c2 + k + 1]
        b = lm3[c3 - k : c3 + k + 1, c3 - k : c3 + k + 1]
        mask = ~np.isnan(a) & ~np.isnan(b)
        np.testing.assert_allclose(a[mask], b[mask])


class TestTrilateration:
    def test_recovers_known_point_3d(self):
        radius = DIAM / 2
        _, xyz = sensors_3d(radius)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 4.0, -3.0
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        res = solve_trilateration_3d(
            xyz[1], xyz[2], xyz[0], d[1] - d[0], d[2] - d[0],
            np.array([0.0, 0.0]),
        )
        assert res is not None
        np.testing.assert_allclose(res, (x, y), atol=0.05)

    def test_recovers_known_point_2d(self):
        radius = DIAM / 2
        locs = [polar_to_cartesian(0.9 * radius, p) for p in (0, 120, 240)]
        locs = [(float(a), float(b)) for a, b in locs]
        x, y = -2.0, 5.0
        d = [np.hypot(x - sx, y - sy) for (sx, sy) in locs]
        res = solve_trilateration(
            locs[1], locs[2], locs[0], d[1] - d[0], d[2] - d[0],
            np.array([1.0, 1.0]),
        )
        np.testing.assert_allclose(res, (x, y), atol=0.05)

    def test_batched(self):
        radius = DIAM / 2
        _, xyz = sensors_3d(radius)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-radius * 0.7, radius * 0.7, (32, 2))
        sensors = np.tile(np.asarray(xyz, np.float32), (32, 1, 1))
        d = np.linalg.norm(
            pts[:, None, :] - np.asarray(xyz)[None, :, :2], axis=-1
        )
        deltas = np.stack([d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]], axis=1)
        out, ok = trilaterate_batch(
            jnp.asarray(sensors), jnp.asarray(deltas),
            jnp.zeros((32, 2), jnp.float32),
        )
        out, ok = np.asarray(out), np.asarray(ok)
        assert ok.mean() > 0.9
        np.testing.assert_allclose(out[ok], pts[ok], atol=0.1)

    def test_infeasible_returns_failure(self):
        radius = DIAM / 2
        _, xyz = sensors_3d(radius)
        res = solve_trilateration_3d(
            xyz[1], xyz[2], xyz[0], 1e6, -1e6, np.array([0.0, 0.0])
        )
        assert res is None


def feed_events(locator, xyz, hits, c, jitter=0.0, rng=None):
    """Generate per-sensor onset events for hits and feed them in order."""
    events = []
    results = []
    t0 = 10000
    for i, (x, y) in enumerate(hits):
        base = t0 + i * 30000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        for ch in range(3):
            onset = base + int(round(d[ch] / c * SR))
            if rng is not None and jitter:
                onset += int(rng.integers(-jitter, jitter + 1))
            events.append((onset, ch))
    for onset, ch in sorted(events):
        res = locator.locate(ch, onset)
        if res is not None:
            results.append(res)
    return results


class TestMultilaterate3D:
    def test_locates_exact_lags(self):
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        hits = [(3.0, 2.0), (-6.0, 1.0), (0.5, -8.0), (10.0, 5.0)]
        results = feed_events(m, xyz, hits, c)
        assert len(results) == len(hits)
        for (x, y), res in zip(hits, results):
            assert np.hypot(res[0] - x, res[1] - y) < 1.0

    def test_tolerates_small_onset_jitter(self):
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(0)
        hits = [(3.0, 2.0), (-6.0, 1.0)]
        results = feed_events(m, xyz, hits, c, jitter=2, rng=rng)
        assert len(results) >= 1
        for res in results:
            best = min(np.hypot(res[0] - x, res[1] - y) for x, y in hits)
            assert best < 3.0

    def test_illegal_lag_rejected(self):
        radius = DIAM / 2
        polar, _ = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        assert m.locate(0, 1000) is None
        # lag way beyond the drum's physical span on the same seed
        assert m.locate(1, 1000 + 100000) is None

    def test_feasibility_cascade_recovers_grid_aliased_hit(self):
        """A genuine strike ~5.6 cm from sensor 0: its two lag hyperbolae
        become nearly concentric circles around that sensor, and at the cm
        grid quantization the ±1 cm bands share NO cell (zero jointly
        feasible cells on the whole map) — the reference's single-tier
        is_legal_3d (multilateration.py:413-426, tolerance=1) silently
        drops the completed group (its own `TODO: INVESTIGATE THIS` path,
        :508).  Default tols=(1.0,) reproduces that (parity); the
        (1.0, 2.0) cascade recovers the hit, Newton refining the coarser
        cell to <0.2 cm.  Event sequence recorded from the realtime sim's
        modal stream (true strike (10.43, -0.55))."""
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        seq = [(48068, 0), (48268, 2), (48276, 1)]

        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        assert [m.locate(ch, o) for o, ch in seq] == [None, None, None]
        # the completed group parked inert (reference behavior)
        assert any(len(g[0]) == 3 for g in m.ongoing)

        m2 = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                             sr=SR, feasibility_tols=(1.0, 2.0))
        res = [m2.locate(ch, o) for o, ch in seq]
        assert res[:2] == [None, None] and res[2] is not None
        assert np.hypot(res[2][0] - 10.43, res[2][1] + 0.55) < 0.2

    def test_feasibility_cascade_jittable_parity(self):
        """The jittable locator inherits the host's feasibility_tols and
        emits the same recovered point."""
        import jax.numpy as jnp

        from onset_fingerprinting_tpu.locate.multilaterate import (
            locator_init,
            make_locate_update,
        )

        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        seq = [(48068, 0), (48268, 2), (48276, 1)]
        for tols, expect_emit in [((1.0,), False), ((1.0, 2.0), True)]:
            m = Multilaterate3D(polar, drum_diameter=DIAM,
                                medium="drumhead", sr=SR,
                                feasibility_tols=tols)
            upd = make_locate_update(m, capacity=8)
            st = locator_init(8)
            emitted = []
            for o, ch in seq:
                st, xy, valid = upd(st, jnp.int32(ch), jnp.int32(o))
                if bool(valid):
                    emitted.append(np.asarray(xy))
            assert bool(emitted) == expect_emit
            if expect_emit:
                assert np.hypot(emitted[0][0] - 10.43,
                                emitted[0][1] + 0.55) < 0.2

    def test_model_bypass(self):
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)

        class FakeModel:
            def call_np(self, lags):
                return np.array([0.01, 0.02])

        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR, model=FakeModel())
        c = speed_of_sound(100, medium="drumhead")
        results = feed_events(m, xyz, [(3.0, 2.0)], c)
        assert len(results) == 1
        np.testing.assert_allclose(results[0], [1.0, 2.0])


class TestMultilaterate2D:
    def test_locates(self):
        radius = DIAM / 2
        polar = [(0.9, 0.0), (0.9, 120.0), (0.9, 240.0)]
        locs = [polar_to_cartesian(0.9 * radius, p) for p in (0, 120, 240)]
        locs = [(float(a), float(b), 0.0) for a, b in locs]
        m = Multilaterate(polar, drum_diameter=DIAM, medium="drumhead", sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        res = feed_events(m, locs, [(4.0, 3.0)], c)
        assert len(res) == 1
        r, phi = res[0]
        x, y = polar_to_cartesian(r * radius, phi)
        assert np.hypot(float(x) - 4.0, float(y) - 3.0) < 1.0


class TestMultilateratePaired:
    def test_locate_cc_votes(self):
        radius = DIAM / 2
        polar = [(0.9, 0.0), (0.9, 90.0), (0.9, 180.0), (0.9, 270.0)]
        m = MultilateratePaired(polar, drum_diameter=DIAM, scale=1,
                                medium="drumhead", sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 5.0, 2.0
        locs = [polar_to_cartesian(0.9 * radius, p) for p in (0, 90, 180, 270)]
        rng = np.random.default_rng(0)
        n = 2000
        sig_len = 400
        audio = rng.normal(0, 1e-4, (n, 4))
        burst = np.sin(2 * np.pi * np.arange(sig_len) * 0.2) * np.exp(
            -np.arange(sig_len) / 100
        )
        onset0 = 500
        delays = []
        for ch, (sx, sy) in enumerate(locs):
            d = np.hypot(x - float(sx), y - float(sy))
            delay = int(round(d / c * SR))
            delays.append(delay)
            audio[onset0 + delay : onset0 + delay + sig_len, ch] += burst
        i = int(np.argmin(delays))
        r, phi = m.locate_cc(audio, onset0 + delays[i], i, tol=2)
        px, py = polar_to_cartesian(r * radius, phi)
        # cm-resolution voting grid with ±2 sample tolerance is coarse
        assert np.hypot(float(px) - x, float(py) - y) < 6.0


class TestJittableLocator:
    def test_streaming_locate(self):
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        hits = [(3.0, 2.0), (-6.0, 1.0), (0.5, -8.0)]
        events = []
        for i, (x, y) in enumerate(hits):
            base = 10000 + i * 30000
            d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
            for ch in range(3):
                events.append((base + int(round(d[ch] / c * SR)), ch))
        found = []
        for onset, ch in sorted(events):
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            if bool(emit):
                found.append(np.asarray(point))
        assert len(found) == len(hits)
        for (x, y), p in zip(hits, found):
            assert np.hypot(p[0] - x, p[1] - y) < 1.0

    def test_completion_does_not_seed_group(self):
        """The completing onset must NOT seed a fresh singleton group:
        the reference returns before its singleton append whenever a
        group completed on a feasible lag-map cell
        (multilateration.py:512-531), so a later bounce can't join a
        phantom seed and emit a second point for the same strike."""
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 3.0, 2.0
        base = 10000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        events = sorted(
            (base + int(round(d[ch] / c * SR)), ch) for ch in range(3)
        )
        emits = []
        for onset, ch in events:
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            emits.append(bool(emit))
        assert emits == [False, False, True]
        # every group is consumed — the completing onset seeded nothing
        assert int(np.asarray(state.count).sum()) == 0
        # a bounce on another channel right after starts a FRESH group
        # (count 1) instead of joining a phantom seed
        state, _, emit = update(
            state, jnp.int32(events[0][1]), jnp.int32(events[-1][0] + 40)
        )
        assert not bool(emit)
        counts = np.asarray(state.count)
        assert counts.sum() == 1 and counts.max() == 1

    def test_infeasible_old_completer_does_not_mask_strike(self):
        """Two groups complete on the same onset: a stale-seeded older
        group whose lag-map cell is infeasible, and the true strike
        group.  The reference only returns at a completing group whose
        cell is FEASIBLE (multilateration.py:507-527) — the infeasible
        older group is kept as an inert 3-member group (:531) and must
        not mask the strike's emit."""
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 3.0, 2.0
        base = 10000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        events = sorted(
            (base + int(round(d[ch] / c * SR)), ch) for ch in range(3)
        )
        (t1, ch_a), (t2, ch_b), (t3, ch_c) = events
        # stale seed on the strike's first channel, D samples earlier:
        # big enough that the shifted lag pair hits no feasible cell,
        # small enough that the pair join stays legal and the group
        # stays alive through the strike
        max_ab = m.max_lags[ch_a][ch_b]
        D = 88  # found by scanning D=1..mml for this fixture; the
        # preconditions below re-verify it against the live lag maps
        assert t2 - (t1 - D) < max_ab  # precondition: ch_b still joins
        assert t3 - (t1 - D) < m.max_lags[ch_a][ch_c]  # ch_c joins too
        assert t3 - (t1 - D) <= m.max_max_lags[ch_a]  # stays alive
        # precondition: the shifted lag pair must be lag-map infeasible
        # (the reference's own is_legal_3d check)
        shifted = ([ch_a, ch_b, ch_c],
                   [t1 - D, t2, t3])
        assert m.is_legal_3d(shifted) == (0, 0)

        seq = [(t1 - D, ch_a)] + events
        emits, points = [], []
        for onset, ch in seq:
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            emits.append(bool(emit))
            points.append(np.asarray(point))
        assert emits == [False, False, False, True]
        px, py = points[-1][:2]
        assert np.hypot(px - x, py - y) < 1.0
        # the infeasible completer (older than the returning group) stays
        # alive as an inert 3-member group; everything else is consumed
        counts = sorted(np.asarray(state.count).tolist())
        assert counts == [0] * 7 + [3]

    def test_differential_fuzz_vs_host(self):
        """Differential fuzz: random strikes with injected garbage onsets
        through BOTH the host parity class (a transliteration of the
        reference's locate loop, duplicate-append quirk included) and the
        jittable update must produce the same emit pattern and matching
        points.  Garbage onsets create stale seeds that exercise the
        insertion-order completion/purge semantics beyond the scripted
        scenarios above."""
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(7)
        t = 20000
        mml = int(max(m.max_max_lags))
        n_emit = 0
        for k in range(60):
            r = np.sqrt(rng.uniform(0.01, 0.64)) * radius
            ang = rng.uniform(0, 2 * np.pi)
            x, y = r * np.cos(ang), r * np.sin(ang)
            d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
            ev = sorted(
                (t + int(round(di / c * SR)), ch)
                for ch, di in enumerate(d)
            )
            events = list(ev)
            if rng.random() < 0.4:
                gch = int(rng.integers(3))
                events = [
                    (ev[0][0] - int(rng.integers(20, 150)), gch)
                ] + events
            elif rng.random() < 0.5:
                # out-of-order delivery: the earliest onset arrives later
                # (backtracking crossed a block boundary) — exercises the
                # negative-lag seed swap in both implementations.  Only
                # for strikes without an injected garbage seed: with two
                # live groups the host swaps mid-scan and continues with
                # the swapped identity, a documented single-candidate
                # deviation of the jittable step.
                first = events.pop(0)
                events.insert(int(rng.integers(1, 3)), first)
            for onset, ch in events:
                res = m.locate(ch, int(onset))
                state, point, emit = update(
                    state, jnp.int32(ch), jnp.int32(onset)
                )
                assert bool(emit) == (res is not None), (k, onset, ch)
                if res is not None:
                    n_emit += 1
                    p = np.asarray(point)
                    assert np.hypot(p[0] - res[0], p[1] - res[1]) < 0.1, (
                        k, p, res,
                    )
            t += mml * 3 + int(rng.integers(0, 500))
        assert n_emit >= 40  # most strikes must actually emit

    def test_negative_lag_seed_swap_matches_host(self):
        """Backtracking can deliver an onset EARLIER than a live group's
        seed (negative lag).  The reference swaps the group seed with the
        incoming onset and carries on (multilateration.py:443-449); the
        jittable update must do the same, or out-of-order arrivals
        silently miss strikes the host emits."""
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 4.0, -3.0
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        ev = sorted(
            (10000 + int(round(di / c * SR)), ch)
            for ch, di in enumerate(d)
        )
        # earliest onset delivered last (and mid): its lag vs the live
        # seed is negative, forcing the swap on the 2nd/3rd delivery
        for order in ([1, 2, 0], [1, 0, 2]):
            state = locator_init(8)
            m.ongoing = []
            emits_h, emits_j, pts = [], [], []
            for i in order:
                onset, ch = ev[i]
                res = m.locate(ch, int(onset))
                state, point, emit = update(
                    state, jnp.int32(ch), jnp.int32(onset)
                )
                emits_h.append(res is not None)
                emits_j.append(bool(emit))
                if res is not None:
                    pts.append((np.asarray(point), res))
            assert emits_j == emits_h, order
            assert emits_j[-1], order
            p, res = pts[-1]
            assert np.hypot(p[0] - res[0], p[1] - res[1]) < 0.1, order
            assert np.hypot(p[0] - x, p[1] - y) < 1.0, order

    def test_two_live_groups_negative_lag_divergence_is_benign(self):
        """When TWO live groups both see a negative lag, the reference
        chains swaps across groups in scan order while the jittable update
        swaps only the oldest — a documented bounded deviation
        (multilaterate.py negative-lag block).  This pins that the
        divergence is benign: neither path emits a spurious hit on the
        adversarial deliveries, and both recover to emit the next clean
        strike at the same point."""
        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)
        mml = int(max(m.max_max_lags))
        c = speed_of_sound(100, medium="drumhead")

        # Two live groups seeded by the SAME sensor (the second ch0 onset
        # is a member of group A, so it opens group B), then an onset
        # earlier than both seeds: negative lag against A AND B.
        t1 = 10000
        t2 = t1 + max(2, mml // 4)
        t0 = t1 - 40
        for ch, onset in [(0, t1), (0, t2), (1, t0)]:
            res = m.locate(ch, onset)
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            assert res is None, (ch, onset)
            assert not bool(emit), (ch, onset)

        # After the stale groups age out, a clean strike must emit
        # identically through both paths.
        x, y = 3.0, -2.0
        t = t2 + mml * 3 + 1000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        ev = sorted(
            (t + int(round(di / c * SR)), ch) for ch, di in enumerate(d)
        )
        emits_h, emits_j, pts = [], [], []
        for onset, ch in ev:
            res = m.locate(ch, int(onset))
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            emits_h.append(res is not None)
            emits_j.append(bool(emit))
            if res is not None and bool(emit):
                pts.append((np.asarray(point), res))
        assert emits_h == emits_j
        assert emits_h[-1] and len(pts) == 1
        p, res = pts[0]
        assert np.hypot(p[0] - res[0], p[1] - res[1]) < 0.1
        assert np.hypot(p[0] - x, p[1] - y) < 1.0

    def test_age_rebase_long_session(self):
        """``next_age`` grows by one per update; the _AGE_INF sentinel
        comparisons and the evict-score bias assume real ages stay below
        _AGE_REBASE.  Once the counter crosses the threshold the state
        rebases, so a locator that has run for weeks keeps emitting —
        simulated by starting the counter at the threshold."""
        from onset_fingerprinting_tpu.locate.multilaterate import (
            _AGE_REBASE,
        )

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        update = make_locate_update(m)
        state = locator_init(8)._replace(
            next_age=jnp.int32(_AGE_REBASE + 1)
        )
        c = speed_of_sound(100, medium="drumhead")
        x, y = 3.0, 2.0
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        ev = sorted(
            (10000 + int(round(di / c * SR)), ch)
            for ch, di in enumerate(d)
        )
        emits = []
        for onset, ch in ev:
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            emits.append(bool(emit))
        assert emits == [False, False, True]
        p = np.asarray(point)
        assert np.hypot(p[0] - x, p[1] - y) < 1.0
        assert int(state.next_age) < 100  # rebased back near zero

    def test_model_bypass(self):
        """model= replaces the Newton solve with the FCNN, in-device."""
        import jax
        from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        net = FCNN(output_size=2, hidden_layers=(4,), batch_norm=False)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2), jnp.float32), train=False)
        bundle = FCNNBundle(net, variables)
        update = make_locate_update(m, model=bundle)
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        x, y = 3.0, 2.0
        base = 10000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        events = sorted(
            (base + int(round(d[ch] / c * SR)), ch) for ch in range(3)
        )
        found = []
        for onset, ch in events:
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            if bool(emit):
                found.append(np.asarray(point))
        assert len(found) == 1
        # expected: FCNN prediction (meters) * 100 — not the Newton answer
        lags = [events[1][0] - events[0][0], events[2][0] - events[0][0]]
        expected = bundle.call_np(lags) * 100.0
        np.testing.assert_allclose(found[0], expected, rtol=1e-5)

    def test_model_bypass_by_channel(self):
        """model_input='by_channel' feeds fixed-channel-order ADJACENT
        lags (the reference's np.diff training convention,
        calibration.py:347) even when the arrival order differs from the
        channel order."""
        import jax
        from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR, model_input="by_channel")
        net = FCNN(output_size=2, hidden_layers=(4,), batch_norm=False)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2), jnp.float32), train=False)
        bundle = FCNNBundle(net, variables)
        update = make_locate_update(
            m, model=bundle, model_input="by_channel"
        )
        state = locator_init(8)
        c = speed_of_sound(100, medium="drumhead")
        # phi=280 deg: arrival order is ch2, ch0, ch1 — NOT channel order
        x, y = 8 * np.cos(np.radians(280)), 8 * np.sin(np.radians(280))
        base = 10000
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        on = [base + int(round(di / c * SR)) for di in d]
        assert on[2] < on[0] < on[1], "fixture must break channel order"
        found = []
        for onset, ch in sorted((on[ch], ch) for ch in range(3)):
            state, point, emit = update(
                state, jnp.int32(ch), jnp.int32(onset)
            )
            if bool(emit):
                found.append(np.asarray(point))
        assert len(found) == 1
        # expected input: ADJACENT channel-order diffs = np.diff
        # (calibration.py:347), negative values allowed
        feats = [on[1] - on[0], on[2] - on[1]]
        expected = bundle.call_np(feats) * 100.0
        np.testing.assert_allclose(found[0], expected, rtol=1e-5)
        # host-class twin must agree on the same group
        m_host = Multilaterate3D(polar, drum_diameter=DIAM,
                                 medium="drumhead", sr=SR, model=bundle,
                                 model_input="by_channel")
        order = np.argsort(on)
        group = ([int(order[0]), int(order[1]), int(order[2])],
                 [on[order[0]], on[order[1]], on[order[2]]])
        np.testing.assert_allclose(
            m_host.trilaterate(group, None), expected, rtol=1e-5
        )

    def test_by_channel_validation(self):
        polar, _ = sensors_3d(DIAM / 2)
        with pytest.raises(ValueError, match="model_input"):
            Multilaterate3D(polar, model_input="nope")
        with pytest.raises(ValueError, match="3 sensors"):
            Multilaterate3D(
                polar + [(0.9, 60.0, 0.0)], model_input="by_channel"
            )


class TestCalibration:
    def test_calibration_locations(self):
        locs = calibration_locations(4, 2, 0.1)
        assert len(locs) == 8
        assert all(r == 0.1 for r, _ in locs)
        locs_z = calibration_locations(4, 2, 0.1, add_z=0)
        assert len(locs_z[0]) == 3

    def _make_tdoa(self, sensors, radius_m, n_lugs=10, n_each=4,
                   center_hits=4, c=343.0, sr=SR):
        sounds = [(0.0, 0.0, 0.0)] * center_hits + [
            tuple(map(float, spherical_to_cartesian(*p)))
            for p in calibration_locations(n_lugs, n_each, radius_m * 0.9, 0)
        ]
        sounds = np.asarray(sounds)
        d = np.linalg.norm(
            sounds[:, None, :] - sensors[None, :, :], axis=-1
        ) / c
        return np.diff(d, axis=1), sounds

    def test_calibrate_recovers_sensors(self):
        radius = DIAM / 2 / 100  # meters
        true_sensors = np.array(
            [
                tuple(map(float, spherical_to_cartesian(*p)))
                for p in [(0.8 * radius, 135, 80), (0.8 * radius, 15, 60),
                          (0.15, 100, 20)]
            ]
        )
        tdoa, _ = self._make_tdoa(true_sensors, radius)
        onsets_like = np.cumsum(
            np.concatenate([np.zeros((len(tdoa), 1)), tdoa * SR], axis=1),
            axis=1,
        )
        est = calibrate(onsets_like, sr=SR, C=343.0, n_lugs=10, n_each=4,
                        hits_at=0.9, center_hits=4, norm=2)
        # Coplanar calibration hits leave sensor-z weakly constrained (mirror
        # near-degeneracy), so judge the fit by its TDOA residual — the
        # quantity calibration optimizes — plus a loose position sanity bound.
        tdoa, sounds = self._make_tdoa(true_sensors, radius)
        d_est = np.linalg.norm(
            sounds[:, None, :] - est[None, :, :], axis=-1
        ) / 343.0
        resid = np.abs(np.diff(d_est, axis=1) - tdoa)
        assert resid.mean() < 2e-5  # ≲ 2 samples @ 96 kHz
        assert np.abs(est - true_sensors).max() < 0.15

    def test_optimize_positions_reduces_loss(self):
        rng = np.random.default_rng(0)
        radius = DIAM / 2 / 100
        true_sensors = np.array(
            [[0.1, 0.1, 0.05], [-0.1, 0.05, 0.08], [0.0, -0.12, 0.02]]
        )
        sounds = np.concatenate(
            [rng.uniform(-0.1, 0.1, (30, 2)), np.zeros((30, 1))], axis=1
        )
        d = np.linalg.norm(
            sounds[:, None, :] - true_sensors[None, :, :], axis=-1
        )
        c = 343.0
        lags = (d[:, :2] - d[:, 2:]) / c * SR
        sens, est_sounds, est_c = optimize_positions(
            lags,
            true_sensors + rng.normal(0, 0.005, true_sensors.shape),
            sounds + rng.normal(0, 0.005, sounds.shape) * [1, 1, 0],
            lr=0.1,
            num_epochs=500,
            C=c,
            sr=SR,
        )
        d2 = np.linalg.norm(
            est_sounds[:, None, :] - sens[None, :, :], axis=-1
        )
        tdoa2 = (d2[:, :2] - d2[:, 2:]) / est_c
        err = np.abs(tdoa2 - (d[:, :2] - d[:, 2:]) / c).mean()
        assert err < 2e-5

    def test_train_location_model(self):
        rng = np.random.default_rng(0)
        sounds = np.concatenate(
            [rng.uniform(-0.1, 0.1, (64, 2)), np.zeros((64, 1))], axis=1
        )
        sensors = np.array(
            [[0.1, 0.1, 0.05], [-0.1, 0.05, 0.08], [0.0, -0.12, 0.02]]
        )
        d = np.linalg.norm(
            sounds[:, None, :] - sensors[None, :, :], axis=-1
        )
        lags = (d[:, 1:] - d[:, :1]) / 343.0 * SR
        model, errors = train_location_model(
            lags, sounds, lr=0.01, num_epochs=2000, patience=100,
            hidden_layers=[32, 32], batch_norm=True,
        )
        assert errors[-1] < errors[0]
        pred = model.call_np(tuple(lags[0]))
        assert pred.shape == (2,)
        preds = np.asarray(model(jnp.asarray(lags, jnp.float32)))
        assert np.mean(np.abs(preds - sounds[:, :2])) < 0.05

    def test_train_location_model_chunked_returns_best_params(self):
        """epochs_per_step>1 must return params whose ACTUAL loss matches
        the tracked best: best-tracking pairs each snapshot with the loss
        evaluated AT those params (end-of-chunk), never a mid-chunk
        minimum the snapshot can't reproduce (regression: the chunked
        path once paired the chunk-min loss with post-chunk params — up
        to k-1 updates past the optimum, at a warm-restart LR spike)."""
        rng = np.random.default_rng(1)
        lags = rng.normal(size=(48, 4)).astype(np.float32)
        truth = lags @ rng.normal(size=(4, 2)).astype(np.float32) * 0.05
        model, errors = train_location_model(
            lags, truth, lr=0.02, num_epochs=240, patience=240,
            epochs_per_step=40, hidden_layers=[16],
        )
        final = float(
            np.mean(np.abs(np.asarray(model(jnp.asarray(lags))) - truth))
        )
        # the returned params must reproduce reported-quality loss: no
        # worse than a small factor over the best per-epoch loss seen
        assert final <= max(2.0 * float(np.min(errors)), 1e-4)
        assert final <= float(errors[0])


class TestCCRefinement:
    def test_locate_with_rec_audio_refines_jittered_onsets(self):
        """The locator's live-buffer CC refinement path
        (multilateration.py:457-501): feed onsets that are a few samples off
        and provide ring audio; refinement should still produce an accurate
        location."""
        from onset_fingerprinting_tpu.core.ring_buffer import CircularArray

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(1)
        x, y = 5.0, -3.0
        n = 8000
        audio = rng.normal(0, 1e-5, (n, 3))
        t = np.arange(500)
        burst = np.sin(2 * np.pi * 4000 / SR * t) * np.exp(-t / 120)
        base = 3000
        true_onsets = []
        for ch, (sx, sy, _) in enumerate(xyz):
            d = np.hypot(x - sx, y - sy)
            onset = base + int(round(d / c * SR))
            audio[onset : onset + 500, ch] += burst
            true_onsets.append(onset)
        ring = CircularArray(np.zeros((n, 3), dtype=np.float32))
        ring.write(audio.astype(np.float32))

        jitter = [0, 4, -3]
        res = None
        order = np.argsort(true_onsets)
        for i in order:
            res = m.locate(int(i), true_onsets[i] + jitter[i], ring) or res
        assert res is not None
        assert np.hypot(res[0] - x, res[1] - y) < 2.5


class TestJittableCCRefinement:
    def test_refinement_recovers_jittered_onsets(self):
        """Onsets jittered beyond the lag-map joint tolerance fail without
        refinement and locate correctly with it (the jittable twin of the
        reference's live-buffer CC refinement)."""
        import jax.numpy as jnp
        from onset_fingerprinting_tpu.detect.refine import cc_refine_lag_jax

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(2)

        x, y = 5.0, -3.0
        n = 6000
        audio = rng.normal(0, 1e-5, (n, 3)).astype(np.float32)
        t = np.arange(500)
        burst = np.sin(2 * np.pi * 4000 / SR * t) * np.exp(-t / 120)
        base = 3000
        true_onsets = []
        for ch, (sx, sy, _) in enumerate(xyz):
            d = np.hypot(x - sx, y - sy)
            onset = base + int(round(d / c * SR))
            audio[onset : onset + 500, ch] += burst.astype(np.float32)
            true_onsets.append(onset)
        jitter = [0, 22, -20]  # >> is_legal_3d tolerance (~12 samples)
        events = sorted(
            (true_onsets[ch] + jitter[ch], ch) for ch in range(3)
        )

        def run(cc_refine):
            upd = make_locate_update(m, cc_refine=cc_refine)
            state = locator_init(8)
            w = upd.window_len
            found = []
            for onset, ch in events:
                if cc_refine:
                    # window of live audio ending a block after the event
                    end = onset + 128
                    pad = np.zeros((max(w - end, 0), 3), np.float32)
                    win = np.concatenate([pad, audio[max(end - w, 0):end]])
                    state_new, point, emit = upd(
                        state, jnp.int32(ch), jnp.int32(onset),
                        jnp.asarray(win), jnp.int32(end - w),
                    )
                else:
                    state_new, point, emit = upd(
                        state, jnp.int32(ch), jnp.int32(onset)
                    )
                state = state_new
                if bool(emit):
                    found.append(np.asarray(point))
            return found

        # without refinement the jittered lags land on a wrong grid cell
        # (≈2.7 cm error); with refinement the CC recovers the true lags
        unrefined = run(cc_refine=False)
        errs_u = [float(np.hypot(p[0] - x, p[1] - y)) for p in unrefined]
        assert all(e > 1.5 for e in errs_u)
        found = run(cc_refine=True)
        assert len(found) == 1
        assert np.hypot(found[0][0] - x, found[0][1] - y) < 0.5

    def test_adjust_matches_host_energy_heuristic(self):
        """cc_refine_adjust_jax == host cross_correlation_lag + adjust_onset
        on the same prepared section (detection.py:299-352 parity)."""
        import jax.numpy as jnp
        from scipy.ndimage import median_filter

        from onset_fingerprinting_tpu.detect.refine import (
            adjust_onset,
            cc_refine_adjust_jax,
        )
        from onset_fingerprinting_tpu.ops.xcorr import cross_correlation_lag

        rng = np.random.default_rng(3)
        w = 1024
        t = np.arange(300)
        burst = np.sin(2 * np.pi * 4000 / SR * t) * np.exp(-t / 100)
        lookaround, tol, cutoff = 60, 50, 10
        for jit0, jit1 in [(0, 22), (15, 0), (0, -18), (-8, 6)]:
            win = rng.normal(0, 1e-5, (w, 2)).astype(np.float32)
            t0, t1 = 400, 430  # true onsets
            win[t0: t0 + 300, 0] += burst.astype(np.float32)
            win[t1: t1 + 300, 1] += burst.astype(np.float32)
            pos0, pos1 = t0 + jit0, t1 + jit1
            # host pipeline on the identically prepared section
            sec = win.copy()
            sec[: pos0 - lookaround] = 0.0
            sec = np.diff(median_filter(sec, size=(5, 1)), axis=0)
            sec[sec >= 0] = 0.0
            sec = np.abs(sec)
            lag = cross_correlation_lag(
                sec[:, 0], sec[:, 1], [pos0, pos1],
                onset_tolerance=tol, normalization_cutoff=cutoff,
            )
            assert lag is not None
            ca, cb = adjust_onset([pos0, pos1], sec[:, 0], sec[:, 1], lag)
            ja, jb, ok = cc_refine_adjust_jax(
                jnp.asarray(win), jnp.int32(pos0), jnp.int32(pos1),
                lookaround=lookaround, onset_tolerance=tol,
                normalization_cutoff=cutoff,
            )
            assert bool(ok), (jit0, jit1)
            assert (int(ja), int(jb)) == (ca, cb), (jit0, jit1)

    def test_swap_when_refined_onset_precedes_seed(self):
        """A late-detected second sensor whose true onset precedes the seed's
        is swapped into the seed slot (multilateration.py:443-449); the hit
        still completes with an accurate position."""
        import jax.numpy as jnp

        radius = DIAM / 2
        polar, xyz = sensors_3d(radius)
        m = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                            sr=SR)
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(4)

        # hit toward sensor 1, close enough to center that sensor 1 leads
        # the others by only ~25-40 samples (within the CC search window)
        s1 = np.array(xyz[1][:2])
        x = y = None
        for frac in np.linspace(0.05, 0.95, 19):
            p = frac * s1
            d = [np.hypot(p[0] - ax, p[1] - ay) for (ax, ay, _) in xyz]
            lead = (d[0] - d[1]) / c * SR
            if 25 <= lead <= 40:
                x, y = float(p[0]), float(p[1])
                break
        assert x is not None
        n = 6000
        audio = rng.normal(0, 1e-5, (n, 3)).astype(np.float32)
        t = np.arange(500)
        burst = np.sin(2 * np.pi * 4000 / SR * t) * np.exp(-t / 120)
        base = 3000
        true_onsets = []
        for ch, (ax, ay, _) in enumerate(xyz):
            d = np.hypot(x - ax, y - ay)
            onset = base + int(round(d / c * SR))
            audio[onset: onset + 500, ch] += burst.astype(np.float32)
            true_onsets.append(onset)
        # sensor 1 is truly earliest but detected LATE, so sensor 0 arrives
        # first and seeds the group; refinement must swap them
        assert min(true_onsets) == true_onsets[1]
        jitter = [0, true_onsets[0] - true_onsets[1] + 6, 0]
        assert jitter[1] <= 50  # within the CC onset tolerance
        events = sorted(
            ((true_onsets[ch] + jitter[ch], ch) for ch in range(3)),
            key=lambda e: (e[0], e[1]),
        )
        assert events[0][1] == 0  # detection order puts sensor 0 first

        upd = make_locate_update(m, cc_refine=True)
        state = locator_init(8)
        w = upd.window_len
        found = []
        for onset, ch in events:
            end = onset + 128
            pad = np.zeros((max(w - end, 0), 3), np.float32)
            win = np.concatenate([pad, audio[max(end - w, 0):end]])
            state, point, emit = upd(
                state, jnp.int32(ch), jnp.int32(onset),
                jnp.asarray(win), jnp.int32(end - w),
            )
            if bool(emit):
                found.append(np.asarray(point))
        assert len(found) == 1
        # near-center hits have shallow lag gradients; match the host CC
        # refinement test's 2.5 cm bar
        assert np.hypot(found[0][0] - x, found[0][1] - y) < 2.5


class TestIntensityMaps:
    def test_lag_intensity_map(self):
        from onset_fingerprinting_tpu.locate import lag_intensity_map

        lags, db_a, db_b = lag_intensity_map(
            (-10.0, 0.0, 5.0), (10.0, 0.0, 5.0), reflectivity=0.5,
            d=DIAM, sr=SR,
        )
        lags, db_a, db_b = map(np.asarray, (lags, db_a, db_b))
        assert lags.shape == db_a.shape == db_b.shape
        # symmetry: swapping mics mirrors the lag map sign
        r = lags.shape[0] // 2
        assert lags[r, r] == 0
        # intensity decays with distance: cell nearest mic A is louder on A
        assert db_a[r, 2] > db_a[r, -3]

    def test_attenuate_intensity_angles(self):
        from onset_fingerprinting_tpu.locate import attenuate_intensity

        amp, theta = attenuate_intensity(
            (np.array([0.0]), np.array([0.0]), 0.0),
            np.array([0.0, 0.0, 10.0]), 0.5, 1.0,
        )
        # directly above the source: angle 0, amplitude 1/d
        assert np.isclose(float(theta[0]), 0.0, atol=1e-4)
        assert np.isclose(float(amp[0]), 0.1, atol=1e-4)


class TestOptimizeC:
    def test_recovers_speed_of_sound(self):
        from onset_fingerprinting_tpu.locate import optimize_C

        radius = DIAM / 2 / 100
        true_c = 340.0
        true_sensors = np.array(
            [
                tuple(map(float, spherical_to_cartesian(*p)))
                for p in [(0.8 * radius, 135, 80), (0.8 * radius, 15, 60),
                          (0.14, 100, 20)]
            ]
        )
        sounds = np.asarray(
            [(0.0, 0.0, 0.0)] * 4
            + [
                tuple(map(float, spherical_to_cartesian(*p)))
                for p in calibration_locations(10, 4, 0.155, 0)
            ]
        )
        d = np.linalg.norm(
            sounds[:, None, :] - true_sensors[None, :, :], axis=-1
        ) / true_c
        tdoa = np.diff(d, axis=1)
        positions, best_c = optimize_C(
            tdoa, norm=2, C_range=(336, 345), initial_C=343.0,
            sound_positions=sounds,
        )
        assert positions.shape == (3, 3)
        assert 336 <= best_c <= 345
        # C trades off against sensor geometry for coplanar sources, so judge
        # the pipeline by its TDOA residual at the chosen (positions, C)
        d_est = np.linalg.norm(
            sounds[:, None, :] - positions[None, :, :], axis=-1
        ) / best_c
        resid = np.abs(np.diff(d_est, axis=1) - tdoa)
        assert resid.mean() < 1e-5  # ≲ 1 sample @ 96 kHz
