"""Realtime engine, actions, and online analysis tests."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core.config import DetectorConfig, RealtimeConfig
from onset_fingerprinting_tpu.core.coords import (
    polar_to_cartesian,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.core.ring_buffer import CircularArray
from onset_fingerprinting_tpu.locate import Multilaterate3D
from onset_fingerprinting_tpu.realtime import (
    Actions,
    Bounds,
    Location,
    OnlineAnalysis,
    ParameterChange,
    ParameterMapper,
    RealtimeEngine,
    Sample,
    find_offset,
    load_setup,
    save_setup,
)
from onset_fingerprinting_tpu.realtime.actions import FxParams

SR = 96000
DIAM = 14 * 2.54


class TestLocationBounds:
    def test_location_from_cartesian(self):
        loc = Location(x=1.0, y=1.0)
        assert np.isclose(loc.phi, 45.0)

    def test_location_r_normalization(self):
        # raw distance without a drum radius; radius-fraction with one
        # (the reference's r is always 1.0 — actions.py:172-174 quirk)
        assert np.isclose(Location(x=3.0, y=4.0).r, 5.0)
        assert np.isclose(Location(x=3.0, y=4.0, radius=10.0).r, 0.5)

    def test_location_from_polar(self):
        loc = Location(r=2.0, phi=90.0)
        assert np.isclose(loc.x, 0.0, atol=1e-6)
        assert np.isclose(loc.y, 2.0)

    def test_bounds_wraparound_phi(self):
        b = Bounds(phi=[270, 90])
        assert Location(r=1.0, phi=0.0) in b
        assert Location(r=1.0, phi=300.0) in b
        assert Location(r=1.0, phi=180.0) not in b

    def test_bounds_cartesian(self):
        b = Bounds(x=[0, 1], y=[0, 1])
        assert Location(x=0.5, y=0.5) in b
        assert Location(x=-0.5, y=0.5) not in b


class TestActions:
    def test_parameter_change_sets_fx(self):
        fx = FxParams(["cutoff"])
        b = Bounds(phi=[0, 360])
        pm = ParameterMapper.from_bounds_fx(b, fx, "phi", ["cutoff"])
        pc = ParameterChange([b], fx, [pm])
        actions = Actions()
        actions.append(pc)
        out = np.zeros((128, 2), np.float32)
        actions.run(out, Location(r=1.0, phi=180.0))
        assert np.isclose(fx.parameters["cutoff"].raw_value, 0.5)

    def test_sample_playback_consumes(self):
        sample = np.ones((100, 2), np.float32)
        s = Sample([Bounds()], sample, gain=0.5)
        actions = Actions()
        actions.append(s)
        out = np.zeros((64, 2), np.float32)
        actions.run(out, Location(x=0.0, y=0.1))
        assert np.allclose(out, 0.5)
        out2 = np.zeros((64, 2), np.float32)
        actions.run(out2, Location(x=0.0, y=0.1))
        # re-triggered AND continued: consumed after 100 samples then reset
        assert s.current_sample <= 100

    def test_spawn_on_consumption(self):
        spawned = Sample([Bounds()], np.ones((10, 2), np.float32))
        s = Sample([Bounds()], np.ones((10, 2), np.float32))
        s.spawn = spawned
        actions = Actions()
        actions.append(s)
        out = np.zeros((64, 2), np.float32)
        actions.run(out, Location(x=0.0, y=0.1))
        assert spawned in actions.actions


def _make_engine(ring_seconds=0.5):
    cfg = DetectorConfig(
        n_channels=3, block_size=128, hipass_freq=0.0, sr=SR,
        fast_attack=3.0, fast_release=383.0,
    )
    polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
    locator = Multilaterate3D(
        polar, drum_diameter=DIAM, medium="drumhead", sr=SR
    )
    return cfg, locator, RealtimeEngine(cfg, locator, ring_seconds=ring_seconds)


class TestRealtimeEngine:
    def test_detect_and_locate_stream(self):
        cfg, locator, eng = _make_engine()
        radius = DIAM / 2
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        xyz = [
            tuple(
                float(v)
                for v in spherical_to_cartesian(r * radius, phi, th)
            )
            for (r, phi, th) in polar
        ]
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(0)
        n = SR  # 1 s
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        hits = [(4.0, -2.0, 30000), (-7.0, 3.0, 60000)]
        t = np.arange(600)
        burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150) * 0.6)
        for (x, y, base) in hits:
            for ch, (sx, sy, _) in enumerate(xyz):
                d = np.hypot(x - sx, y - sy)
                s = base + int(round(d / c * SR))
                audio[s : s + 600, ch] += burst.astype(np.float32)
        eng.warmup(audio[:12800])

        located = []
        for i in range(12800 // 128, n // 128):
            _, locs = eng.process(audio[i * 128 : (i + 1) * 128])
            located.extend(locs)
        assert len(located) == len(hits)
        for (x, y, _), loc in zip(hits, located):
            assert np.hypot(loc.x - x, loc.y - y) < 1.5

    def test_actions_integration(self):
        cfg, locator, eng = _make_engine()
        fx = FxParams(["cutoff"])
        b = Bounds(phi=[0, 360])
        pm = ParameterMapper.from_bounds_fx(b, fx, "phi", ["cutoff"])
        eng.actions.append(ParameterChange([b], fx, [pm]))
        # inject a fake location by calling actions directly through process
        out, locs = eng.process(np.zeros((128, 3), np.float32))
        assert out.shape == (128, 2)

    def test_event_counter_before_first_block(self):
        """No time reference exists before the first processed block —
        must return (0, 0), not crash unpacking callback_time=None."""
        cfg, locator, eng = _make_engine()
        assert eng.event_counter() == (0, 0)

    def test_harvest_overflow_warns_and_counts(self):
        """Device event-queue overflow must never be silent: the lost
        count is warned, accumulated, and the newest events delivered."""
        import warnings as _w

        cfg, locator, eng = _make_engine()
        eq = eng.state.ev_points.shape[0]
        pts = jnp.arange(eq * 2, dtype=jnp.float32).reshape(eq, 2)
        eng.state = eng.state._replace(
            ev_points=pts,
            ev_onsets=jnp.arange(eq, dtype=jnp.int32),
            ev_count=jnp.int32(eq + 3),  # 3 oldest slots overwritten
        )
        with pytest.warns(UserWarning, match="overflowed"):
            events = eng.harvest()
        assert len(events) == eq
        assert eng.harvest_drops == 3
        # delivered events start at the oldest surviving slot (count - eq)
        assert events[0][0] == int(np.asarray(eng.state.ev_onsets)[3 % eq])

    def test_harvest_count_exact_past_f32_integers(self):
        """ev_count rides the packed f32 transfer bit-preserved — a plain
        cast would round past 2^24 cumulative hits."""
        cfg, locator, eng = _make_engine()
        eq = eng.state.ev_points.shape[0]
        big = 2**24 + 1  # not representable as f32
        eng._harvested = big - 2
        eng.state = eng.state._replace(ev_count=jnp.int32(big))
        events = eng.harvest()
        assert len(events) == 2
        assert eng.harvest_drops == 0

    def test_event_counter(self):
        cfg, locator, eng = _make_engine()
        eng.process(np.zeros((128, 3), np.float32))
        eng.process(np.zeros((128, 3), np.float32))
        counter, since = eng.event_counter()
        # counter = index of the last block start + wall-clock samples since
        assert since >= 0
        assert counter >= 128
        assert eng.current_index == 256


class TestOnlineAnalysis:
    def _click_track(self, bpm=120, seconds=6, sr=48000):
        n = sr * seconds
        audio = np.random.default_rng(0).normal(0, 1e-3, n).astype(np.float32)
        beat = int(sr * 60 / bpm)
        t = np.arange(256)
        click = (np.sin(2 * np.pi * 2000 / sr * t) * np.exp(-t / 40)).astype(
            np.float32
        )
        for s in range(sr // 2, n - 300, beat):
            audio[s : s + 256] += click
        return audio

    def test_onset_strength_and_bpm(self):
        cfg = RealtimeConfig(
            sr=48000, blocksize=256, hop_length=256, n_fft=1024,
            tg_win_length=384, max_recording_seconds=8,
        )
        audio = self._click_track(bpm=120, sr=48000)
        ring = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
        ana = OnlineAnalysis(cfg, ring)
        hop = cfg.hop_length
        for i in range(len(audio) // hop):
            ring.write(audio[i * hop : (i + 1) * hop, None])
            ana.hop()
        onsets, env = ana.detect_onsets(-900)
        # ~2 clicks/s over the analyzed window
        assert len(onsets) >= 6
        bpm = ana.bpm(-800)
        assert 110 < bpm < 130 or 55 < bpm < 65  # octave ambiguity allowed

    def test_micro_batched_dispatch_matches_single_block(self):
        """start_pipeline(batch_blocks=n) scans the SAME per-block step —
        the state trajectory (and so every located hit) must be identical
        to n sequential single-block steps."""
        import jax
        import jax.numpy as jnp

        from onset_fingerprinting_tpu.locate import Multilaterate3D

        cfg = DetectorConfig(n_channels=3, block_size=128, hipass_freq=0.0,
                             sr=96000)
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        loc = Multilaterate3D(polar, drum_diameter=14 * 2.54,
                              medium="drumhead", sr=96000)
        rng = np.random.default_rng(0)
        blocks = rng.normal(0, 0.1, (8, 128, 3)).astype(np.float32)

        eng_a = RealtimeEngine(cfg, loc, use_pallas=False)
        for b in blocks:
            eng_a.process_nosync(b)
        st_a = eng_a.state

        eng_b = RealtimeEngine(cfg, loc, use_pallas=False)
        eng_b.start_pipeline(depth=16, batch_blocks=4)
        st = eng_b.state
        st = eng_b._step_multi(st, jnp.asarray(blocks[:4]))
        st = eng_b._step_multi(st, jnp.asarray(blocks[4:]))
        eng_b.stop_pipeline()

        for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_out_of_order_hop_end_never_uses_stale_cache(self):
        """hop(end=...) permits arbitrary stream positions; the cached
        previous log-spectrum is only valid when the new hop follows the
        cached one by exactly one hop_length.  A non-consecutive hop must
        fall back to the stft[-2] recompute (the None path's semantics) —
        pinned by comparing against an instance whose cache is cleared
        before the jump."""
        cfg = RealtimeConfig(
            sr=48000, blocksize=256, hop_length=256, n_fft=1024,
            tg_win_length=384, max_recording_seconds=8,
        )
        audio = self._click_track(bpm=120, seconds=2, sr=48000)
        hop = cfg.hop_length

        def run(clear_cache_before_jump):
            ring = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
            ana = OnlineAnalysis(cfg, ring)
            for i in range(12):
                ring.write(audio[i * hop : (i + 1) * hop, None])
                ana.hop()
            # replay an EARLIER position out of order (end jumps backward
            # by 3 hops), then a forward jump skipping 2 hops
            if clear_cache_before_jump:
                ana._prev_logspec = None
            ana.hop(end=9 * hop)
            if clear_cache_before_jump:
                ana._prev_logspec = None
            ring.write(audio[12 * hop : 15 * hop, None])
            ana.hop(end=15 * hop)
            return np.asarray(ana.onset_env[-3:])

        np.testing.assert_array_equal(run(False), run(True))

    def test_poll_catches_up_at_true_positions(self):
        """A worker that polls less often than once per hop must produce
        the exact per-hop analysis sequence of an in-step worker: poll()
        pins each pending hop to its ABSOLUTE stream position
        (hop(end=...)) instead of re-reading the window at the live
        cursor (the reference's workers consume one queue event per hop,
        recording.py:273-327)."""
        cfg = RealtimeConfig(
            sr=48000, blocksize=256, hop_length=256, n_fft=1024,
            tg_win_length=384, max_recording_seconds=8,
        )
        audio = self._click_track(bpm=120, seconds=3, sr=48000)
        hop = cfg.hop_length
        n_hops = len(audio) // hop

        ring_a = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
        ana_a = OnlineAnalysis(cfg, ring_a)
        for i in range(n_hops):
            ring_a.write(audio[i * hop : (i + 1) * hop, None])
            ana_a.hop()

        ring_b = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
        ana_b = OnlineAnalysis(cfg, ring_b)
        polled = 0
        i = 0
        for burst in itertools.cycle([3, 1, 5, 2, 7, 4]):
            burst = min(burst, n_hops - i)
            if burst == 0:
                break
            ring_b.write(audio[i * hop : (i + burst) * hop, None])
            i += burst
            polled += ana_b.poll()
        assert polled == n_hops

        np.testing.assert_array_equal(
            np.asarray(ana_a.stft[-16:]), np.asarray(ana_b.stft[-16:])
        )
        np.testing.assert_array_equal(
            np.asarray(ana_a.onset_env[-64:]),
            np.asarray(ana_b.onset_env[-64:]),
        )
        np.testing.assert_array_equal(ana_a.mov_max, ana_b.mov_max)

    def test_quantize_start_moves_to_click(self):
        cfg = RealtimeConfig(
            sr=48000, blocksize=256, hop_length=256, n_fft=1024,
            tg_win_length=384, max_recording_seconds=8,
        )
        audio = self._click_track(bpm=120, sr=48000)
        ring = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
        ana = OnlineAnalysis(cfg, ring)
        hop = cfg.hop_length
        for i in range(len(audio) // hop):
            ring.write(audio[i * hop : (i + 1) * hop, None])
            ana.hop()
        # place a marker 3000 samples after a beat; quantize should pull it
        beat = int(48000 * 60 / 120)
        marker = 48000 // 2 + 6 * beat + 3000
        ana.recording_start = marker
        move = ana.quantize_start()
        assert abs(marker + move - (48000 // 2 + 6 * beat)) < 1500

    def test_find_offset(self):
        sr = 48000
        bpm = 120
        beat = sr * 60 // bpm
        onsets = np.arange(6) * beat + 700
        off = find_offset(onsets, bpm, sr, method="Powell")
        assert abs(off + 700) <= 100 or abs(off - (beat - 700)) <= 100


class TestSetupIO:
    def test_round_trip_with_model(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle

        args = {"output_size": 2, "hidden_layers": [8], "batch_norm": False,
                "input_size": 2}
        fcnn = FCNN(output_size=2, hidden_layers=[8], batch_norm=False)
        variables = fcnn.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2)), train=False
        )
        bundle = FCNNBundle(fcnn, variables)
        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", 82.0, bundle, args, tmp_path)
        conf, model = load_setup(tmp_path)
        assert conf["medium"] == "drumhead"
        assert conf["c"] == 82.0
        np.testing.assert_allclose(conf["sensor_locations"], locs)
        pred1 = bundle.call_np((1.0, 2.0))
        pred2 = model.call_np((1.0, 2.0))
        np.testing.assert_allclose(pred1, pred2, atol=1e-6)

    def test_no_model(self, tmp_path):
        save_setup([[0.9, 0, 0]], "air", None, None, None, tmp_path)
        conf, model = load_setup(tmp_path)
        assert model is None and conf["c"] is None

    def test_feasibility_tols_roundtrip(self, tmp_path):
        """Setups can opt the serve locator into the feasibility cascade
        (recovers grid-aliased near-sensor strikes the reference drops —
        see test_locate.py's cascade tests)."""
        from onset_fingerprinting_tpu.realtime.main import build_engine

        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", 82.0, None, None, tmp_path,
                   feasibility_tols=(1.0, 2.0))
        conf, _ = load_setup(tmp_path)
        assert conf["feasibility_tols"] == [1.0, 2.0]
        eng = build_engine(tmp_path)
        assert eng.locator.feasibility_tols == (1.0, 2.0)


class TestEngineMetrics:
    def test_metrics_recorded(self):
        from onset_fingerprinting_tpu.utils.metrics import Metrics

        cfg, locator, _ = _make_engine()
        m = Metrics()
        eng = RealtimeEngine(cfg, locator, metrics=m)
        for _ in range(3):
            eng.process(np.zeros((128, 3), np.float32))
        s = m.summary()
        assert s["counters"]["engine.blocks"] == 3
        assert s["latency"]["engine.step"]["count"] == 3


class TestAsyncHarvest:
    def test_nosync_plus_harvest_equals_sync(self):
        """The device-side event queue must deliver the same hits as the
        synchronous per-block path."""
        cfg, locator, eng_sync = _make_engine()
        _, _, eng_async = _make_engine()
        radius = DIAM / 2
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        xyz = [
            tuple(float(v) for v in spherical_to_cartesian(r * radius, p, t))
            for (r, p, t) in polar
        ]
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(1)
        n = SR // 2
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        t = np.arange(600)
        burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150) * 0.6)
        for (x, y, base) in [(3.0, 1.0, 20000), (-5.0, 4.0, 40000)]:
            for ch, (sx, sy, _) in enumerate(xyz):
                d = np.hypot(x - sx, y - sy)
                s = base + int(round(d / c * SR))
                audio[s : s + 600, ch] += burst.astype(np.float32)
        eng_sync.warmup(audio[:12800])
        eng_async.warmup(audio[:12800])
        sync_locs = []
        for i in range(12800 // 128, n // 128):
            blk = audio[i * 128 : (i + 1) * 128]
            _, locs = eng_sync.process(blk)
            sync_locs.extend(locs)
            eng_async.process_nosync(blk)
        async_ev = eng_async.harvest()
        assert len(async_ev) == len(sync_locs) == 2
        for (onset, la), ls in zip(async_ev, sync_locs):
            assert np.isclose(la.x, ls.x, atol=1e-5)
            assert np.isclose(la.y, ls.y, atol=1e-5)
            assert onset > 0
        # second harvest is empty
        assert eng_async.harvest() == []


class TestServeAppEntry:
    def test_drum_diameter_persists_to_locator(self, tmp_path):
        """A setup saved for a non-default head size must rebuild the
        locator with matching lag-legality geometry (a 25 cm-radius rig
        served with 17.78 cm maps silently drops rim hits)."""
        from onset_fingerprinting_tpu.realtime.main import build_engine

        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", None, None, None, tmp_path,
                   drum_diameter=50.0)
        engine = build_engine(tmp_path, sr=SR)
        assert engine.locator.radius == 25.0

    def test_build_engine_from_setup_and_run_wav(self, tmp_path, rng):
        """realtime.main: load_setup → engine wiring → WAV streaming through
        the native executor (the reference's app entry, main.py:66-105)."""
        from onset_fingerprinting_tpu.core.audio_io import write_wav
        from onset_fingerprinting_tpu.realtime.main import build_engine, run_wav

        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", 0.82, None, None, tmp_path)
        engine = build_engine(tmp_path, sr=SR)
        assert engine.cfg.n_channels == 3
        # engine must process a block end-to-end
        out, _ = engine.process(np.zeros((128, 3), np.float32))
        assert out.shape == (128, 2)
        # WAV streaming path (short file)
        audio = rng.normal(0, 1e-4, (SR // 4, 3)).astype(np.float32)
        write_wav(tmp_path / "in.wav", audio, SR)
        run_wav(engine, tmp_path / "in.wav")

    def test_setup_model_runs_in_device_step(self, tmp_path, rng):
        """A setup dir's saved FCNN replaces the Newton solve INSIDE the
        fused engine step (the reference calls torch on host per hit,
        multilateration.py:555-557): with a constant-output model, every
        emitted location is the model's prediction."""
        import jax
        import jax.numpy as jnp

        from onset_fingerprinting_tpu.core.coords import (
            speed_of_sound,
            spherical_to_cartesian,
        )
        from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle
        from onset_fingerprinting_tpu.realtime.main import build_engine

        margs = {"output_size": 2, "hidden_layers": [4], "batch_norm": False}
        net = FCNN(**margs)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2), jnp.float32), train=False)
        variables = jax.tree.map(lambda a: a * 0, variables)
        params = dict(variables["params"])
        last = sorted(params)[-1]
        params[last] = dict(params[last], bias=jnp.array([0.05, -0.03]))
        bundle = FCNNBundle(net, {"params": params})
        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", None, bundle, margs, tmp_path)
        engine = build_engine(tmp_path, sr=SR)

        # synthesize one hit at (3, 2) cm
        radius = engine.locator.radius
        xyz = [spherical_to_cartesian(0.9 * radius, p, 0) for p in
               (0, 120, 240)]
        c = speed_of_sound(100, medium="drumhead")
        audio = rng.normal(0, 1e-4, (SR // 4, 3)).astype(np.float32)
        t = np.arange(600)
        burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150)
                 * 0.6).astype(np.float32)
        for ch, (sx, sy, _) in enumerate(xyz):
            d = np.hypot(3.0 - float(sx), 2.0 - float(sy))
            s = 6000 + int(round(d / c * SR))
            audio[s: s + 600, ch] += burst
        found = []
        for i in range(0, len(audio) - 128 + 1, 128):
            _, hit_locs = engine.process(audio[i: i + 128])
            found.extend(hit_locs)
        assert len(found) == 1
        # the constant model output (meters) * 100, NOT the Newton (3, 2)
        np.testing.assert_allclose([found[0].x, found[0].y], [5.0, -3.0],
                                   atol=1e-4)


class TestStreamingUtilityHelpers:
    def test_helpers(self, tmp_path):
        from onset_fingerprinting_tpu.realtime.analysis import (
            channels_to_int,
            frames_to_samples,
            int_to_channels,
            magsquared,
            make_clave,
            samples_to_frames,
        )

        assert samples_to_frames(1024, 128) == 8
        assert frames_to_samples(8, 128) == 1024
        assert channels_to_int([0, 2]) == 5
        assert int_to_channels(5) == [0, 2]
        z = np.array([3 + 4j])
        np.testing.assert_allclose(magsquared(z), [25.0])
        clave = make_clave(48000)
        assert clave.dtype == np.float32 and np.abs(clave).max() > 0.3

    def test_rotating_save(self, tmp_path):
        cfg = RealtimeConfig(sr=48000, max_recording_seconds=1,
                             n_fft=512, hop_length=256, tg_win_length=128)
        ring = CircularArray(np.zeros((cfg.rec_n, 1), np.float32))
        ring.write(np.random.default_rng(0).normal(
            0, 0.1, (4800, 1)).astype(np.float32))
        ana = OnlineAnalysis(cfg, ring)
        p0 = ana.save_audio_rotating(tmp_path / "rec")
        p1 = ana.save_audio_rotating(tmp_path / "rec")
        assert p0.name == "0.wav" and p1.name == "1.wav"


class TestPlanDrainRecordQuantize:
    """The analysis side-channel wired into the serve app: run_wav paces
    OnlineAnalysis.hop off the host ring and drains Actions.plans (the
    reference's plan_callback thread, realtime/main.py:20-41), so a pair of
    RecordTriggers produces a quantized recording marker and a BPM estimate
    (recording.py:379-395,495-569)."""

    def test_run_wav_record_quantize_bpm(self, tmp_path):
        from onset_fingerprinting_tpu.core.audio_io import write_wav
        from onset_fingerprinting_tpu.realtime.actions import RecordTrigger
        from onset_fingerprinting_tpu.realtime.main import build_engine, run_wav

        sr = 48000
        bpm_true = 60
        beat = sr * 60 // bpm_true
        n = sr * 9
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 1e-3, (n, 3)).astype(np.float32)
        t = np.arange(256)
        click = (np.sin(2 * np.pi * 2000 / sr * t) * np.exp(-t / 40)).astype(
            np.float32
        )
        first_click = sr // 2
        for s in range(first_click, n - 300, beat):
            audio[s : s + 256] += click[:, None]

        locs = [[0.9, 0, 0], [0.9, 120, 0], [0.9, 240, 0]]
        save_setup(locs, "drumhead", 0.82, None, None, tmp_path)
        rt_cfg = RealtimeConfig(
            sr=sr, blocksize=128, hop_length=256, n_fft=1024,
            tg_win_length=768, max_recording_seconds=12,
        )
        engine = build_engine(tmp_path, sr=sr, rt_cfg=rt_cfg)
        assert engine.analysis is not None

        # schedule: start recording just after the 4th click, stop ~4 beats
        # later (both deferred via at_sample; handled by the plan drain)
        start_at = first_click + 3 * beat + 500
        stop_at = start_at + 4 * beat + 1000
        engine.actions.plans.put_nowait(RecordTrigger(at_sample=start_at))
        engine.actions.plans.put_nowait(RecordTrigger(at_sample=stop_at))

        write_wav(tmp_path / "clicks.wav", audio, sr)
        run_wav(engine, tmp_path / "clicks.wav")

        assert len(engine.recordings) == 1
        start, end, bpm = engine.recordings[0]
        # start marker quantized onto the click grid
        offset = (start - first_click) % beat
        assert min(offset, beat - offset) < 1500, (start, offset)
        # end extrapolated to a whole number of beats at the estimated BPM
        beat_est = int(sr / (bpm / 60))
        assert (end - start) % beat_est == 0
        assert 1 <= (end - start) // beat_est <= 10
        # BPM within tolerance (octave ambiguity allowed, as in the
        # reference's librosa-lineage estimator)
        assert 55 < bpm < 65 or 110 < bpm < 130, bpm


class TestPipelinedDispatch:
    """start_pipeline/process_pipelined must produce the same event stream as
    synchronous process_nosync (single dispatcher preserves block order), and
    never block the caller."""

    def _engine(self):
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        cfg = DetectorConfig(
            n_channels=3, block_size=128, hipass_freq=0.0, sr=SR
        )
        locator = Multilaterate3D(polar, drum_diameter=DIAM,
                                  medium="drumhead", sr=SR)
        return RealtimeEngine(cfg, locator, use_pallas=False)

    def _audio(self):
        radius = DIAM / 2
        polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        xyz = [spherical_to_cartesian(r * radius, phi, th)
               for (r, phi, th) in polar]
        c = speed_of_sound(100, medium="drumhead")
        rng = np.random.default_rng(2)
        n = SR // 2
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        t = np.arange(600)
        burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150)
                 * 0.6).astype(np.float32)
        for base in (SR // 8, SR // 3):
            for ch, (sx, sy, _) in enumerate(xyz):
                d = np.hypot(4.0 - float(sx), -3.0 - float(sy))
                s = base + int(round(d / c * SR))
                audio[s : s + 600, ch] += burst
        return audio

    def test_pipeline_matches_sync(self):
        from onset_fingerprinting_tpu.utils.metrics import Metrics

        audio = self._audio()
        eng_sync = self._engine()
        for i in range(0, len(audio) - 128 + 1, 128):
            eng_sync.process_nosync(audio[i : i + 128])
        ref = eng_sync.harvest()

        eng_pipe = self._engine()
        eng_pipe.metrics = Metrics()
        eng_pipe.start_pipeline(depth=1024)
        for i in range(0, len(audio) - 128 + 1, 128):
            eng_pipe.process_pipelined(audio[i : i + 128])
        eng_pipe.stop_pipeline()
        got = eng_pipe.harvest()

        assert eng_pipe.pipeline_drops == 0
        assert len(ref) > 0
        assert [o for o, _ in got] == [o for o, _ in ref]
        for (_, a), (_, b) in zip(got, ref):
            np.testing.assert_allclose([a.x, a.y], [b.x, b.y], atol=1e-6)
        # enqueue latency is tracked against the budget
        s = eng_pipe.metrics.summary()["latency"]
        assert "engine.enqueue" in s and "engine.dispatch" in s
        assert eng_pipe.metrics.misses("engine.enqueue") <= 2

    def test_full_queue_drops_not_blocks(self):
        import time as _t

        eng = self._engine()
        # prime compile so the dispatcher isn't stuck compiling
        eng.process_nosync(np.zeros((128, 3), np.float32))
        eng.start_pipeline(depth=2)
        block = np.zeros((128, 3), np.float32)
        t0 = _t.perf_counter()
        for _ in range(64):
            eng.process_pipelined(block)
        elapsed = _t.perf_counter() - t0
        eng.stop_pipeline()
        # 64 enqueues must never block on the device (CPU step ~ms each)
        assert elapsed < 2.0


class TestEngineClassifier:
    def test_classify_hits_gathers_ring_windows(self):
        """attach_classifier + classify_hits: the probe model receives
        exactly the [C, W] onset windows from the device ring."""
        cfg, locator, eng = _make_engine(ring_seconds=0.5)

        class Probe:
            def apply(self, params, wins):  # [K, C, W]
                return wins.sum(axis=-1)  # [K, C]

        W, PRE = 256, 64
        eng.attach_classifier(Probe(), None, window=W, pre=PRE, capacity=4)

        rng = np.random.default_rng(7)
        n = SR // 2
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        base = 30000
        t = np.arange(600)
        burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150) * 0.6)
        audio[base : base + 600] += burst[:, None].astype(np.float32)
        eng.warmup(audio[:12800])
        events = []
        for i in range(12800 // 128, n // 128):
            eng.process(audio[i * 128 : (i + 1) * 128])
        events = eng.harvest()
        assert events, "no hits located"
        preds = eng.classify_hits(events)
        assert preds.shape == (len(events), 3)
        for (onset, _), p in zip(events, preds):
            # engine sample counts start at 0 at the first process() call
            # (warmup doesn't write the ring) — translate to audio indices
            start = 12800 + onset - PRE
            ref = audio[start : start + W].sum(axis=0)
            np.testing.assert_allclose(p, ref, rtol=1e-4, atol=1e-5)

    def test_classify_stale_hits_flagged_not_silently_classified(self):
        """A hit whose window audio was already overwritten in the ring
        must get a zeroed prediction, a last_classify_fresh=False flag, a
        classify_stale count and a warning — never a silent classification
        of the wrong (newer) audio.  Early-stream onsets (onset < pre,
        nothing overwritten yet) stay fresh."""
        import warnings as _warnings

        cfg, locator, eng = _make_engine(ring_seconds=0.25)

        class Probe:
            def apply(self, params, wins):
                return wins.sum(axis=-1) + 1.0  # never zero for real audio

        W, PRE = 256, 64
        eng.attach_classifier(Probe(), None, window=W, pre=PRE, capacity=4)
        rng = np.random.default_rng(3)
        audio = rng.normal(0.1, 1e-2, (SR // 2, 3)).astype(np.float32)
        eng.warmup(audio[:12800])
        for i in range(12800 // 128, audio.shape[0] // 128):
            eng.process_nosync(audio[i * 128 : (i + 1) * 128])
        counter = int(eng.state.ring.counter)
        cap = int(eng.state.ring.capacity)
        stale_onset = counter - cap - 1000  # long overwritten
        fresh_onset = counter - W  # still retained
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            preds = eng.classify_hits(
                [(stale_onset, None), (fresh_onset, None)]
            )
        assert eng.last_classify_fresh.tolist() == [False, True]
        assert eng.classify_stale == 1
        assert np.all(preds[0] == 0.0)
        assert np.all(preds[1] != 0.0)
        assert any("stale" in str(w.message) for w in rec)

        # early-stream onset: onset - pre < 0 but nothing overwritten —
        # must be classified (clamped), NOT flagged stale
        cfg2, locator2, eng2 = _make_engine(ring_seconds=0.25)
        eng2.attach_classifier(Probe(), None, window=W, pre=PRE, capacity=4)
        eng2.warmup(audio[:12800])
        for i in range(100, 104):
            eng2.process_nosync(audio[i * 128 : (i + 1) * 128])
        preds2 = eng2.classify_hits([(0, None)])
        assert eng2.last_classify_fresh.tolist() == [True]
        assert eng2.classify_stale == 0
        assert np.all(preds2[0] != 0.0)

    def test_classify_requires_attach(self):
        cfg, locator, eng = _make_engine()
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            eng.classify_hits([(100, None)])


class TestStreamMocked:
    """engine.stream() against a mocked sounddevice/PortAudio — the
    reference's primary serve mode (audio.py:81-124) exercised end-to-end
    without hardware: the fake Stream drives the real callback with
    synthetic blocks at the configured blocksize."""

    def test_stream_callback_roundtrip(self, monkeypatch):
        import sys
        import types

        cfg, locator, eng = _make_engine()

        class FakeStream:
            def __init__(self, samplerate, device, channels, callback,
                         latency, blocksize):
                self.kw = dict(
                    samplerate=samplerate, device=device,
                    channels=channels, latency=latency,
                    blocksize=blocksize,
                )
                self.callback = callback
                self.started = False

            def start(self):
                self.started = True

            def stop(self):
                self.started = False

            def drive(self, indata):
                out = np.zeros(
                    (indata.shape[0], self.kw["channels"][1]), np.float32
                )
                self.callback(indata, out, indata.shape[0], None, None)
                return out

        fake_sd = types.ModuleType("sounddevice")
        fake_sd.Stream = FakeStream
        monkeypatch.setitem(sys.modules, "sounddevice", fake_sd)

        s = eng.stream(device="mock", latency=0.002)
        assert isinstance(s, FakeStream)
        assert s.kw["samplerate"] == cfg.sr
        assert s.kw["blocksize"] == cfg.block_size
        assert s.kw["channels"] == (cfg.n_channels, eng.monitor_channels)
        s.start()

        rng = np.random.default_rng(0)
        burst = (
            np.sin(2 * np.pi * 5000 / SR * np.arange(600))
            * np.exp(-np.arange(600) / 150) * 0.6
        ).astype(np.float32)
        audio = rng.normal(0, 1e-4, (SR // 2, 3)).astype(np.float32)
        audio[20000:20600] += burst[:, None]
        for i in range(audio.shape[0] // 128):
            block = audio[i * 128 : (i + 1) * 128]
            out = s.drive(block)
            assert out.shape == (128, 2)
            assert np.isfinite(out).all()
            # passthrough monitor is the x2 mix (audio.py:109)
            np.testing.assert_allclose(out[:, 0], 2.0 * block[:, 0],
                                       atol=1e-6)
        s.stop()
        # the callback path fed the detector: the injected burst was seen
        assert eng.current_index == audio.shape[0]
