import json

import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core import (
    CircularArray,
    DetectorConfig,
    PipelineConfig,
    cartesian_to_polar,
    cartesian_to_spherical,
    load_config,
    polar_to_cartesian,
    query_circular,
    ring_init,
    ring_read_last,
    ring_slice,
    ring_write,
    save_config,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.core.audio_io import read_wav, write_wav
from onset_fingerprinting_tpu.core import posd


class TestRingBuffer:
    def test_write_read_wrap(self):
        rb = ring_init(8, (2,))
        for i in range(5):
            rb = ring_write(rb, jnp.full((3, 2), i, dtype=jnp.float32))
        # 15 frames written into capacity 8; last 8 = [2,3,3,3,4,4,4] pattern
        last = np.asarray(ring_read_last(rb, 8))
        expect = np.repeat([2, 3, 4], 3)[-8:]
        np.testing.assert_array_equal(last[:, 0], expect)
        assert int(rb.counter) == 15

    def test_ring_slice_negative(self):
        rb = ring_init(16)
        rb = ring_write(rb, jnp.arange(20, dtype=jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(ring_slice(rb, -4, 0)), [16, 17, 18, 19]
        )

    def test_circular_array_matches_ring(self):
        ca = CircularArray(np.zeros((16, 3), dtype=np.float32))
        rb = ring_init(16, (3,))
        rng = np.random.default_rng(1)
        for _ in range(7):
            blk = rng.normal(size=(5, 3)).astype(np.float32)
            ca.write(blk)
            rb = ring_write(rb, jnp.asarray(blk))
        np.testing.assert_allclose(ca[-10:], np.asarray(ring_read_last(rb, 10)))
        assert ca.counter == int(rb.counter)

    def test_query_circular(self):
        data = np.arange(8.0)
        out = query_circular(data, slice(-3, 0), counter=10)
        np.testing.assert_array_equal(out, [7, 0, 1])


class TestCoords:
    def test_polar_round_trip(self):
        x, y = polar_to_cartesian(2.0, 135.0)
        r, phi = cartesian_to_polar(x, y)
        assert np.isclose(float(r), 2.0, atol=1e-6)
        assert np.isclose(float(phi), 135.0, atol=1e-4)

    def test_polar_normalized_radius(self):
        r, _ = cartesian_to_polar(3.0, 4.0, r=10.0)
        assert np.isclose(float(r), 0.5)

    def test_spherical_round_trip(self):
        # elevation convention: theta >= 0 is elevation above the x-y plane
        x, y, z = spherical_to_cartesian(1.0, 30.0, 45.0)
        assert float(z) > 0
        r, phi, theta = cartesian_to_spherical(
            float(x), float(y), float(z)
        )
        assert np.isclose(float(r), 1.0, atol=1e-6)
        assert np.isclose(float(phi), 30.0, atol=1e-4)
        assert np.isclose(float(theta), 45.0, atol=1e-4)

    def test_speed_of_sound(self):
        # reference formula: (331.3 + 0.606 T)(1 + 0.0124 H)
        assert np.isclose(
            speed_of_sound(), (331.3 + 0.606 * 20.0) * (1 + 0.0124 * 0.5)
        )
        assert speed_of_sound(medium="drumhead") == 82.0
        assert np.isclose(
            speed_of_sound(100, medium="drumhead"), 8200.0
        )


class TestConfig:
    def test_round_trip(self, tmp_path):
        cfg = PipelineConfig()
        cfg.detector.n_channels = 4
        save_config(cfg, tmp_path / "cfg.json")
        back = load_config(tmp_path / "cfg.json")
        assert back.detector.n_channels == 4
        assert back.realtime.sr == 96000

    def test_missing_constants_defined(self):
        # The reference referenced these without defining them (SURVEY §2.5 R5)
        from onset_fingerprinting_tpu.core.config import RealtimeConfig

        rc = RealtimeConfig()
        assert rc.max_offset > 0
        assert rc.avg_length > rc.max_length / 4
        assert rc.wait > 0
        assert rc.onset_det_offset > 0
        assert rc.rec_n == 60 * 96000


class TestAudioIO:
    @pytest.mark.parametrize("subtype", ["float32", "pcm16"])
    def test_wav_round_trip(self, tmp_path, subtype, rng):
        x = np.clip(rng.normal(size=(1000, 3)) * 0.3, -0.99, 0.99).astype(
            np.float32
        )
        write_wav(tmp_path / "t.wav", x, 96000, subtype=subtype)
        y, sr = read_wav(tmp_path / "t.wav")
        assert sr == 96000
        atol = 1e-7 if subtype == "float32" else 1e-4
        np.testing.assert_allclose(y, x, atol=atol)

    def test_mono(self, tmp_path, rng):
        x = rng.normal(size=500).astype(np.float32) * 0.1
        write_wav(tmp_path / "m.wav", x, 44100)
        y, sr = read_wav(tmp_path / "m.wav")
        assert y.ndim == 1 and sr == 44100
        np.testing.assert_allclose(y, x)


class TestPOSD:
    def test_session_round_trip(self, tmp_path, rng):
        audio = rng.normal(size=(48000, 4)).astype(np.float32) * 0.1
        onsets = np.array([[100, 110, 120, -1], [5000, 5010, -1, 5030]])
        locs = np.array([[0.5, 90.0], [0.9, 180.0]], dtype=np.float32)
        hits = posd.make_hits(onsets, locations=locs, zones=["center", "edge"])
        jp = posd.save_session(tmp_path, "sess0", audio, 96000, hits)
        a2, sr, session = posd.load_session(jp)
        assert sr == 96000
        np.testing.assert_allclose(a2, audio, atol=1e-7)
        back = posd.onsets_array(session["hits"])
        np.testing.assert_array_equal(back, onsets)
        np.testing.assert_allclose(posd.locations_array(session["hits"]), locs)
        assert posd.find_sessions(tmp_path) == [jp]

    def test_parse_hits_unwraps_conditions(self):
        df = posd.parse_hits(
            {
                "onset_start": [1, 2],
                "zone": ["a", "b"],
                "conditions": {"stick": ["wood", "nylon"]},
            }
        )
        assert list(df.columns is not None and df["stick"]) == ["wood", "nylon"]
        assert len(df) == 2


class TestInstruments:
    def test_load_and_validate(self, tmp_path):
        posd.write_json(
            {"snare": {"zones": ["center", "edge"],
                       "conditions": {"stick": ["wood", "nylon"]}}},
            tmp_path / "instruments.json",
        )
        inst = posd.load_instruments(tmp_path)["snare"]
        hits = [
            {"onset_start": 10, "zone": "center",
             "conditions": {"stick": "wood"}},
            {"onset_start": 20, "zone": "rim"},
            {"onset_start": 30, "zone": "edge",
             "conditions": {"grip": "x", "stick": "steel"}},
        ]
        problems = posd.validate_hits(hits, inst)
        assert len(problems) == 3
        assert any("rim" in p for p in problems)
        assert any("grip" in p for p in problems)
        assert any("steel" in p for p in problems)
        assert posd.validate_hits(hits[:1], inst) == []
