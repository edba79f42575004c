"""Data layer tests: frame extraction, augmentations, POSD/MCPOSD datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core import posd as posd_io
from onset_fingerprinting_tpu.core.audio_io import write_wav
from onset_fingerprinting_tpu.data import (
    AUGMENTATIONS,
    FastFrameExtractor,
    FrameExtractor,
    MCPOSD,
    POSD,
    StretchFrameExtractor,
    air_absorption,
    gaussian_noise,
    seven_band_eq,
    some_of,
    tanh_distortion,
)


class TestFrameExtractors:
    def test_frame_extractor_1d(self, rng):
        audio = rng.normal(size=4096).astype(np.float32)
        onsets = np.array([100, 500, 900])
        fx = FrameExtractor(frame_length=64, pre_samples=8)
        frames = fx(audio, onsets)
        assert frames.shape == (3, 64)
        np.testing.assert_allclose(frames[0], audio[92 : 92 + 64])

    def test_frame_extractor_min_onset_2d(self, rng):
        audio = rng.normal(size=(4096, 3)).astype(np.float32)
        onsets = np.array([[100, 105, 102], [500, 498, 510]])
        fx = FrameExtractor(64, 0)
        frames = fx(audio, onsets)
        # reference layout [O, C, frame] (data.py:108-110)
        assert frames.shape == (2, 3, 64)
        np.testing.assert_allclose(frames[1], audio[498 : 498 + 64].T)

    def test_frame_extractor_per_channel(self, rng):
        audio = rng.normal(size=(4096, 2)).astype(np.float32)
        onsets = np.array([[100, 130], [600, 580]])
        fx = FrameExtractor(32, 0, use_min_onset=False)
        frames = fx(audio, onsets)
        assert frames.shape == (2, 2, 32)
        np.testing.assert_allclose(frames[0, 1], audio[130:162, 1])

    def test_random_shift_stays_near(self, rng):
        audio = rng.normal(size=4096).astype(np.float32)
        fx = FrameExtractor(64, 0, max_shift=4, seed=1)
        frames = fx(audio, np.array([1000]))
        # frame must start within ±4 samples of the onset
        found = any(
            np.allclose(frames[0], audio[1000 + s : 1000 + s + 64])
            for s in range(-4, 5)
        )
        assert found

    def test_fast_frame_extractor_matches(self, rng):
        audio = rng.normal(size=(4096, 3)).astype(np.float32)
        onsets = np.array([50, 700, 1500])
        ffx = FastFrameExtractor(audio, onsets, 64, 8)
        frames = np.asarray(ffx())
        assert frames.shape == (3, 3, 64)  # [O, C, frame]
        np.testing.assert_allclose(frames[0, 1], audio[42 : 42 + 64, 1])

    def test_fast_frame_extractor_shift_reproducible(self, rng):
        audio = rng.normal(size=(2048, 2)).astype(np.float32)
        ffx = FastFrameExtractor(audio, np.array([500, 900]), 32, 0,
                                 max_shift=4, seed=0)
        a = np.asarray(ffx())
        b = np.asarray(ffx())
        assert a.shape == b.shape == (2, 2, 32)

    def test_stretch_extractor_output_length(self, rng):
        audio = rng.normal(size=4096).astype(np.float32)
        sx = StretchFrameExtractor(128, 0, max_stretch=0.05)
        frames = sx(audio, np.array([500, 1200]))
        assert frames.shape == (2, 128)
        assert np.isfinite(frames).all()


class TestAugmentations:
    @pytest.mark.parametrize(
        "fn", [gaussian_noise, air_absorption, seven_band_eq, tanh_distortion]
    )
    def test_augmentation_shapes(self, fn, rng):
        x = jnp.asarray(rng.normal(size=256).astype(np.float32) * 0.1)
        out = fn(jax.random.PRNGKey(0), x, 96000)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        assert not np.allclose(np.asarray(out), np.asarray(x))

    def test_air_absorption_removes_highs(self, rng):
        sr = 96000
        t = np.arange(4096) / sr
        hi = np.sin(2 * np.pi * 30000 * t).astype(np.float32)
        out = np.asarray(
            air_absorption(jax.random.PRNGKey(1), jnp.asarray(hi), sr,
                           min_distance=80, max_distance=100)
        )
        assert np.abs(out[500:]).mean() < 0.7 * np.abs(hi[500:]).mean()

    def test_tanh_preserves_rms(self, rng):
        x = jnp.asarray(rng.normal(size=1024).astype(np.float32) * 0.3)
        out = np.asarray(tanh_distortion(jax.random.PRNGKey(2), x, 96000))
        rms_in = np.sqrt(np.mean(np.asarray(x) ** 2))
        rms_out = np.sqrt(np.mean(out**2))
        assert abs(rms_in - rms_out) / rms_in < 0.05

    def test_some_of_vmappable(self, rng):
        xs = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32) * 0.1)
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        out = jax.vmap(lambda k, x: some_of(k, x, 96000))(keys, xs)
        assert out.shape == xs.shape
        assert np.isfinite(np.asarray(out)).all()


def _write_session(tmp_path, rng, n=48000, c=4, n_hits=6):
    audio = rng.normal(0, 1e-3, (n, c)).astype(np.float32)
    onsets, locs = [], []
    t = np.arange(400)
    burst = (np.sin(2 * np.pi * 0.2 * t) * np.exp(-t / 100)).astype(np.float32)
    for i in range(n_hits):
        base = 2000 + i * 6000
        audio[base : base + 400] += burst[:, None] * 0.5
        onsets.append(base)
        locs.append([0.1 * i, 10.0 * i])
    hits = posd_io.make_hits(
        np.asarray(onsets), locations=np.asarray(locs, np.float32)
    )
    return posd_io.save_session(tmp_path, "sess", audio, 96000, hits), audio


class TestMCPOSD:
    def test_from_file_full_batch(self, tmp_path, rng):
        jp, audio = _write_session(tmp_path, rng)
        ds = MCPOSD.from_file(tmp_path, "sess", frame_length=128)
        x, y = ds[0]
        assert x.shape == (6, 4, 128)
        assert y.shape == (6, 2)
        assert len(ds) == 1

    def test_split(self, tmp_path, rng):
        _write_session(tmp_path, rng, n=80000, n_hits=10)
        ds = MCPOSD.from_file(tmp_path, "sess", frame_length=64)
        tr, va = ds.split(0.8)
        assert len(tr.x) + len(va.x) == 10

    def test_re_extraction_with_shift(self, tmp_path, rng):
        _write_session(tmp_path, rng)
        ds = MCPOSD.from_file(
            tmp_path, "sess", frame_length=64, max_shift=4, n_extractions=2
        )
        x, y = ds[0]
        assert x.shape[0] == 12 and y.shape[0] == 12

    def test_split_hits_is_hit_disjoint(self, tmp_path, rng):
        """split_hits: no held-out hit contributes ANY window (in any
        augmentation round) to the train side — the leakage-safe split
        for shift-augmented datasets."""
        _write_session(tmp_path, rng, n=80000, n_hits=10)
        ds = MCPOSD.from_file(
            tmp_path, "sess", frame_length=64, max_shift=4, n_extractions=3
        )
        tr, ev = ds.split_hits(0.8, seed=0)
        # disjoint hit partitions of the 10 onsets
        assert len(tr._onsets) == 8 and len(ev._onsets) == 2
        assert not set(tr._onsets) & set(ev._onsets)
        # train keeps the augmentation settings (3 rounds of 8 hits);
        # eval extracts exactly once, unshifted
        xt, yt = tr[0]
        assert xt.shape[0] == 24 and yt.shape[0] == 24
        xe, ye = ev[0]
        assert xe.shape[0] == 2 and ye.shape[0] == 2
        # eval targets are the held-out hits' positions
        full_y = np.asarray(MCPOSD.from_file(
            tmp_path, "sess", frame_length=64
        )[0][1])
        mask = np.isin(np.arange(10), np.searchsorted(
            np.asarray(ds._onsets), np.asarray(ev._onsets)))
        np.testing.assert_allclose(np.asarray(ye), full_y[mask])


class TestPOSD:
    def test_classification_dataset(self, tmp_path, rng):
        # two single-channel sessions with zone labels
        for si, zone in enumerate(["center", "edge"]):
            audio = rng.normal(0, 1e-3, 24000).astype(np.float32)
            onsets = [3000, 9000, 15000]
            for o in onsets:
                audio[o : o + 300] += 0.4 * np.hanning(300).astype(np.float32)
            write_wav(tmp_path / f"s{si}_main.wav", audio, 96000)
            posd_io.write_json(
                {
                    "meta": {"channels": ["main"], "sr": 96000},
                    "hits": [
                        {"onset_start": int(o), "zone": zone} for o in onsets
                    ],
                },
                tmp_path / f"s{si}.json",
            )
        ds = POSD(tmp_path, frame_length=128, channel="main", n_rounds_aug=1)
        # 2 sessions × 3 hits × (1 raw + 1 extractor × 1 aug round)
        assert len(ds) == 12
        x, label = ds[0]
        assert x.shape == (128,)
        assert label["zone"] in {"center", "edge"}
        sub = ds.query("zone == 'edge'")
        assert len(sub) == 6
        assert (sub.labels["zone"] == "edge").all()


class TestPOSDFromAudioOnsets:
    def test_in_memory_constructor(self, rng):
        audios = [rng.normal(0, 1e-3, 12000).astype(np.float32)
                  for _ in range(2)]
        onsets = [[1000, 4000, 7000], [2000, 6000]]
        for a, os_ in zip(audios, onsets):
            for o in os_:
                a[o : o + 200] += 0.3 * np.hanning(200).astype(np.float32)
        ds = POSD.from_audio_onsets(
            audios, onsets, sr=96000, frame_length=128,
            zone_names=["center", "edge"], n_rounds_aug=1,
        )
        # 5 hits × (1 raw + 1 extractor × 1 round) = 10
        assert len(ds) == 10
        assert set(ds.labels["zone"]) == {"center", "edge"}
        x, lbl = ds[3]
        assert x.shape == (128,)
