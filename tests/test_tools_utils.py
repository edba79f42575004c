"""Tools (editor models, tuner core) and utils (eval, plots) tests."""

import json

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

from onset_fingerprinting_tpu.core import posd as posd_io
from onset_fingerprinting_tpu.tools.choose_od_settings import DetectorTuner
from onset_fingerprinting_tpu.tools.modify_hits import (
    HitEditorModel,
    hits_to_long,
    long_to_hits,
)
from onset_fingerprinting_tpu.tools.modify_hits_mc import GroupEditorModel
from onset_fingerprinting_tpu.utils import (
    drum_frequency,
    knn_metrics,
    wave_speed,
)
from onset_fingerprinting_tpu.utils import plots


class TestHitDictConversions:
    def test_round_trip(self):
        wide = {
            "onset_start": [10, 20],
            "zone": ["a", "b"],
            "conditions": {"stick": ["w", "n"]},
        }
        long = hits_to_long(wide)
        assert long[0] == {
            "onset_start": 10, "zone": "a", "conditions": {"stick": "w"}
        }
        back = long_to_hits(long)
        assert back["onset_start"] == [10, 20]
        assert back["conditions"]["stick"] == ["w", "n"]


@pytest.fixture
def session(tmp_path, rng):
    audio = rng.normal(0, 1e-3, (24000, 2)).astype(np.float32)
    hits = posd_io.make_hits(
        np.array([[1000, 1010], [8000, 8020], [15000, -1]]),
        zones=["a", "b", "a"],
    )
    return posd_io.save_session(tmp_path, "sess", audio, 96000, hits)


class TestHitEditorModel:
    def test_edit_and_save(self, session):
        m = HitEditorModel(session)
        assert len(m.records) == 3
        m.move_onset(0, 1234)
        m.set_label(0, "zone", "rim")
        m.delete_hit(2)
        out = m.save()
        assert out.name == "sess-mod.json"
        saved = json.loads(out.read_text())
        assert len(saved["hits"]) == 2
        assert saved["hits"][0]["zone"] == "rim"
        assert saved["hits"][0]["onset_start"] == 1234

    def test_add_hit_sorted(self, session):
        m = HitEditorModel(session)
        idx = m.add_hit(5000, zone="new")
        assert idx == 1

    def test_group_editor_channel_ops(self, session):
        m = GroupEditorModel(session)
        assert m.n_channels() == 2
        m.set_channel_onset(0, 1, 1040)
        assert m.group(0)[1] == 1040
        m.clear_channel(0, 1)
        assert m.group(0)[1] == -1


class TestDetectorTuner:
    def test_detect_recomputes(self, rng):
        audio = rng.normal(0, 1e-4, (48000, 2)).astype(np.float32)
        t = np.arange(500)
        burst = (np.sin(2 * np.pi * 0.3 * t) * np.exp(-t / 100) * 0.5)
        for base in (10000, 25000, 40000):
            audio[base : base + 500] += burst[:, None].astype(np.float32)
        tuner = DetectorTuner(audio, 96000, min_channels=2)
        tuner.values["hipass_freq"] = 0.0
        channels, onsets, groups = tuner.detect()
        assert len(onsets) >= 4
        assert groups is not None and len(groups) >= 2


class TestEvalUtils:
    def test_wave_speed_and_drum_frequency(self):
        v = wave_speed(351.0, 0.05)
        assert 80 < v < 90  # ~83.8 m/s, the drumhead constant's origin
        f = drum_frequency(0.32, 351.0, 0.05, 1, 1)
        assert 100 < f < 300

    def test_knn_metrics(self, rng):
        from sklearn.neighbors import KNeighborsClassifier

        x = np.concatenate([rng.normal(0, 1, (20, 4)),
                            rng.normal(5, 1, (20, 4))])
        y = np.array([0] * 20 + [1] * 20)
        knn = KNeighborsClassifier(3).fit(x, y)
        res = knn_metrics(x, y, y, knn)
        assert set(res) == {0, 1}
        dist, correct = res[0]
        assert correct[:, 0].mean() > 0.9

    def test_plot_res(self, rng):
        from sklearn.neighbors import KNeighborsClassifier

        from onset_fingerprinting_tpu.utils.eval import plot_res

        x = np.concatenate([rng.normal(0, 1, (20, 4)),
                            rng.normal(5, 1, (20, 4))])
        y = np.array([0] * 20 + [1] * 20)
        knn = KNeighborsClassifier(3).fit(x, y)
        ax = plot_res(x[:1], knn, y, 0)
        assert len(ax.lines) == 1
        plt.close("all")


class TestPlots:
    def test_plot_smoke(self, rng):
        audio = rng.normal(size=(2000, 3)).astype(np.float32)
        plots.plot_group(audio, np.array([500, 520, -1]))
        # reference plot_cc signature: an already-computed windowed CC slice
        # of the full 2n-lag CC covering lag_center ± tolerance
        n, lag_center, tol = 256, 256, 60
        cc_full = np.correlate(audio[:n, 0], audio[:n, 1], "full")
        cc_win = cc_full[lag_center - tol : lag_center + tol]
        ax = plots.plot_cc(cc_win, n, lag_center, tol, n_peaks=3)
        line_x = ax.lines[0].get_xdata()
        assert line_x[0] == -n + lag_center - tol  # true lag axis
        plots.plot_cc_signals(audio[:256, 0], audio[:256, 1])
        assert len(plots.get_color_from_cmap("Reds", 0.0, 1.0, 0.5)) == 4
        plots.plot_onsets(audio, [100, 900], [0, 2])
        plots.plot_around(audio[:, 0], 1000)
        plots.cartesian_circle(rng.normal(size=(20, 2)), radius=2.0)
        plots.polar_circle(rng.random(10), rng.random(10) * 360)
        plots.plot_heatmap(rng.normal(size=(8, 8)))
        true = rng.uniform(-1, 1, (50, 2))
        plots.error_heatmap(true, true + rng.normal(0, 0.1, (50, 2)),
                            radius=1.0, grid=4)
        plots.plot_3d_scene(rng.normal(size=(3, 3)),
                            rng.normal(size=(5, 3)))
        lm = rng.normal(size=(20, 20)).astype(np.float32)
        plots.plot_lags_2d(lm)
        plots.plot_lags_3d([{1: lm}, {0: lm}])
        plt.close("all")

    def test_confusion_views(self, rng):
        true = rng.integers(0, 3, 60)
        preds = [np.where(rng.random(60) < 0.8, true, (true + 1) % 3)
                 for _ in range(2)]
        plots.compare_model_confusion(true, preds)
        plots.plot_disagreements(true, preds)
        plots.plot_misclf(true, preds)
        plt.close("all")

    def test_is_legal_3d_plot(self):
        from onset_fingerprinting_tpu.locate import Multilaterate3D

        m = Multilaterate3D(
            [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)],
            medium="drumhead", sr=96000,
        )
        plots.is_legal_3d_plot(m, ([0, 1, 2], [1000, 1030, 1060]))
        plt.close("all")


class TestMineHits:
    def test_mine_wav_to_posd(self, tmp_path, rng):
        from onset_fingerprinting_tpu.core.audio_io import write_wav
        from onset_fingerprinting_tpu.tools.mine_hits import main, mine_file

        n, c = 96000, 3
        audio = rng.normal(0, 1e-4, (n, c)).astype(np.float32)
        t = np.arange(500)
        burst = (np.sin(2 * np.pi * 5000 / 96000 * t) * np.exp(-t / 120)
                 * 0.5)
        trues = []
        for base in range(50000, n - 2000, 12000):
            for ch in range(c):
                audio[base + 5 * ch : base + 5 * ch + 500, ch] += (
                    burst.astype(np.float32)
                )
            trues.append(base)
        write_wav(tmp_path / "rec.wav", audio, 96000)
        out = tmp_path / "mined"
        jp = mine_file(tmp_path / "rec.wav", out, hipass_freq=0.0, fix=True)
        assert jp is not None
        session = posd_io.read_json(jp)
        groups = posd_io.onsets_array(session["hits"])
        assert groups.shape[1] == 3
        assert len(groups) == len(trues)
        for g, base in zip(sorted(groups[:, 0]), trues):
            assert abs(g - base) < 600
        # CLI wrapper
        rc = main([str(tmp_path / "rec.wav"), "--out", str(out),
                   "--hipass", "0"])
        assert rc == 0


class TestTrainSetup:
    def test_cli_session_to_serve_setup(self, tmp_path):
        """tools/train_setup: labeled POSD session → FCNN serve setup that
        build_engine loads with the recorded model_input representation
        (the CLI leg between the label editors and realtime.main)."""
        from onset_fingerprinting_tpu.data.synth import (
            synth_location_session,
        )
        from onset_fingerprinting_tpu.realtime.main import build_engine
        from onset_fingerprinting_tpu.tools.mine_hits import mine_file
        from onset_fingerprinting_tpu.tools.train_setup import main

        sensors = [(0.9, 0.0), (0.9, 120.0), (0.9, 240.0)]
        true_on, true_loc = synth_location_session(
            tmp_path / "d", "s0", n_hits=24, sr=96000, seed=7,
            sensors=sensors, spacing=6000,
        )
        jp = mine_file(
            tmp_path / "d" / "s0.wav", tmp_path / "m", min_channels=3,
            backend="scan",
        )
        assert jp is not None
        # "label" the mined hits: attach ground-truth locations (the role
        # of tools.modify_hits* in the real workflow)
        sess = posd_io.read_json(jp)
        labeled = []
        for h in sess["hits"]:
            seed_on = min(h["onset_start"])
            j = int(np.argmin(np.abs(true_on - seed_on)))
            if abs(int(true_on[j]) - seed_on) < 400:
                h["location"] = [float(v) for v in true_loc[j]]
                labeled.append(h)
        sess["hits"] = labeled
        posd_io.write_json(sess, jp)

        rc = main([
            str(jp), "--out", str(tmp_path / "setup"),
            "--sensors", "0.9,0", "0.9,120", "0.9,240",
            "--location-format", "xy_cm", "--model-input", "by_channel",
            "--epochs", "600", "--cpu",
        ])
        assert rc == 0
        engine = build_engine(tmp_path / "setup", sr=96000)
        assert engine.locator.model_input == "by_channel"
        out, locs = engine.process(np.zeros((128, 3), np.float32))
        assert out.shape == (128, 2) and locs == []

    def test_rejects_bad_sessions(self, tmp_path):
        from onset_fingerprinting_tpu.tools.train_setup import (
            session_lags_and_targets,
        )

        with pytest.raises(ValueError, match="3 channels"):
            session_lags_and_targets(
                {"hits": [{"onset_start": 5, "location": [0.5, 10.0]}]}
            )
        sess = {"hits": [
            {"onset_start": [100, 110, 120], "location": [0.5, 90.0]},
            {"onset_start": [200, -1, 220], "location": [0.2, 0.0]},
            {"onset_start": [300, 310, 320]},
        ]}
        lags, targets = session_lags_and_targets(sess)
        # hit 2 lacks a channel, hit 3 lacks a label → one usable row
        assert lags.shape == (1, 2) and targets.shape == (1, 2)
        # polar convention: r01 * radius along phi=90 → +y, meters
        np.testing.assert_allclose(
            targets[0], [0.0, 0.5 * 17.78 / 100], atol=1e-6
        )
