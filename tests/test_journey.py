"""Full user-journey integration test (the reference's workflow end-to-end).

One test drives the complete path a migrating user follows — the same
loop the reference spreads over notebooks + CLI tools + the serve app
(SURVEY §3.1-§3.4):

    synthesize recording → mine it into POSD (detect → group → align,
    tools/mine_hits.py) → train an FCNN locator on the MINED lags
    (calibration.train_location_model, reference calibration.py:685-754)
    → save_setup → build_engine from the setup dir → stream fresh audio
    → located hits come back near ground truth.

Beyond wiring, this pins the train/serve REPRESENTATION contract: the
fused engine's learned-trilateration bypass feeds the FCNN the pair of
arrival-order sample lags (locate/multilaterate.py jittable locator;
reference multilateration.py:555-557 passes the same raw sample lags),
so the training rows built from mined onsets must use the identical
(second-first, third-first) sample-lag convention — a units or ordering
drift anywhere in the chain fails the final accuracy assertion.

Hits are confined to a patch of the head where the sensor arrival order
is constant (ch0 → ch1 → ch2), because arrival-order lag pairs without
sensor identity are ambiguous across the full head (a reference-design
limitation this framework mirrors for parity).
"""

from __future__ import annotations

import numpy as np
import pytest

from onset_fingerprinting_tpu.core import posd
from onset_fingerprinting_tpu.data.synth import synth_location_session
from onset_fingerprinting_tpu.locate.calibration import train_location_model
from onset_fingerprinting_tpu.realtime.setup_io import save_setup
from onset_fingerprinting_tpu.tools.mine_hits import mine_file

SR = 96000
SENSORS = [(0.9, 0.0), (0.9, 120.0), (0.9, 240.0)]
# constant-arrival-order patch: for phi in [12, 48] deg and any r, the
# bearing gap (hence rim distance) orders ch0 < ch1 < ch2
PATCH = dict(r_range=(0.35, 0.6), phi_range=(12.0, 48.0))


def _mined_lags_and_targets(
    json_path, true_onsets, true_locs_cm, order="arrival"
):
    """Mined POSD hits → (sample-lag pairs, targets in m).

    ``order="arrival"``: sorted-onset pair lags (what the engine's default
    ``model_input="arrival"`` bypass feeds the FCNN — the serve locator's
    swap-on-negative-lag sorts near-ties the same way).
    ``order="by_channel"``: fixed-channel-order adjacent ``np.diff(on)``
    (the reference's training convention; ``model_input="by_channel"``).
    """
    import json

    hits = json.loads(json_path.read_text())["hits"]
    lags, targets = [], []
    for h in hits:
        on = np.asarray(h["onset_start"], np.int64)
        assert on.shape == (3,) and (on >= 0).all(), "need all 3 channels"
        # match to ground truth by seed-onset proximity
        d = np.abs(true_onsets - on.min())
        j = int(np.argmin(d))
        if d[j] > 400:
            continue  # spurious detection: skip, counted via match rate
        if order == "arrival":
            on = np.sort(on)
            lags.append([on[1] - on[0], on[2] - on[0]])
        else:
            lags.append(list(np.diff(on)))
        targets.append(true_locs_cm[j] / 100.0)  # cm → m (FCNN contract)
    return np.asarray(lags, np.float32), np.asarray(targets, np.float32)


def _serve_errors(engine, audio, true_onsets, true_locs_cm, tol=3000):
    """Stream audio block-by-block; match each emitted hit to the nearest
    true onset BY TIME (hit spacing is 6000 samples, so a missed or
    spurious detection cannot misalign the remaining pairs the way a
    bare zip would).  Returns (n_matched, L1 errors in cm)."""
    found = []
    for i in range(0, len(audio) - 128 + 1, 128):
        _, hit_locs = engine.process(audio[i : i + 128])
        found.extend((i, loc) for loc in hit_locs)
    errs = []
    for blk, loc in found:
        j = int(np.argmin(np.abs(true_onsets - blk)))
        if abs(int(true_onsets[j]) - blk) < tol:
            errs.append(
                abs(loc.x - float(true_locs_cm[j][0]))
                + abs(loc.y - float(true_locs_cm[j][1]))
            )
    return len(errs), errs


@pytest.mark.slow
def test_mine_train_serve_round_trip(tmp_path):
    # 1. "record" a labeled session (ground truth known by construction)
    n_train = 48
    true_on, true_loc = synth_location_session(
        tmp_path / "data", "train0", n_hits=n_train, sr=SR, seed=3,
        sensors=SENSORS, spacing=6000, **PATCH,
    )

    # 2. mine it: detect → group → CC-align → POSD session json
    jp = mine_file(
        tmp_path / "data" / "train0.wav", tmp_path / "mined",
        min_channels=3, fix=True, backend="scan",
    )
    assert jp is not None
    lags, targets = _mined_lags_and_targets(jp, true_on, true_loc)
    assert len(lags) >= 0.9 * n_train, f"mined only {len(lags)}/{n_train}"

    # 3. train the location model on the MINED lags (samples → meters)
    bundle, _ = train_location_model(
        lags, targets, lr=1e-2, num_epochs=1500, patience=1500,
        epochs_per_step=50,
    )
    train_err_cm = 100 * np.abs(
        np.asarray(bundle(lags)) - targets
    ).sum(axis=1).mean()
    assert train_err_cm < 1.5, f"train L1 {train_err_cm:.2f} cm"

    # 4. persist the calibrated serve setup (geometry + model)
    margs = {"output_size": 2, "hidden_layers": [10, 10, 10],
             "batch_norm": True}
    sensor_conf = [[r, phi, 0.0] for r, phi in SENSORS]
    save_setup(sensor_conf, "air", None, bundle, margs, tmp_path / "setup")

    # 5. serve fresh audio through the engine built from that setup
    from onset_fingerprinting_tpu.realtime.main import build_engine

    engine = build_engine(tmp_path / "setup", sr=SR)
    n_serve = 8
    serve_on, serve_loc = synth_location_session(
        tmp_path / "serve", "serve0", n_hits=n_serve, sr=SR, seed=11,
        sensors=SENSORS, spacing=6000, **PATCH,
    )
    audio, _, _ = posd.load_session(tmp_path / "serve" / "serve0.json")
    n_matched, errs = _serve_errors(engine, audio, serve_on, serve_loc)
    assert n_matched >= 0.8 * n_serve, f"served {n_matched}/{n_serve}"
    med = float(np.median(errs))
    # lag quantization is ~0.36 cm/sample here; detector timing jitter adds
    # a couple of samples per channel → ~1-2 cm is the honest expectation
    assert med < 2.5, f"serve median L1 {med:.2f} cm (errors {errs})"
    # and the model must actually use the lags: beat predict-the-mean
    mean_pred = targets.mean(axis=0) * 100
    base = float(np.median([
        abs(mean_pred[0] - t[0]) + abs(mean_pred[1] - t[1])
        for t in serve_loc
    ]))
    assert med < base, f"no better than predict-mean ({med:.2f} vs {base:.2f})"


@pytest.mark.slow
def test_journey_by_channel_full_head(tmp_path):
    """Same journey, full head, no patch: model_input='by_channel' serves
    fixed-channel-order lags (the reference's np.diff TRAINING convention,
    calibration.py:347), which are unambiguous across the whole head —
    the arrival-order pair representation the reference serves
    (multilateration.py:555-557) cannot do this (mirror positions
    collide).  This is the documented improvement over reference parity.
    """
    n_train = 96
    true_on, true_loc = synth_location_session(
        tmp_path / "data", "train0", n_hits=n_train, sr=SR, seed=5,
        sensors=SENSORS, spacing=6000,
    )
    jp = mine_file(
        tmp_path / "data" / "train0.wav", tmp_path / "mined",
        min_channels=3, fix=True, backend="scan",
    )
    assert jp is not None
    lags, targets = _mined_lags_and_targets(
        jp, true_on, true_loc, order="by_channel"
    )
    assert len(lags) >= 0.9 * n_train, f"mined only {len(lags)}/{n_train}"

    bundle, _ = train_location_model(
        lags, targets, lr=1e-2, num_epochs=2500, patience=2500,
        epochs_per_step=50,
    )
    margs = {"output_size": 2, "hidden_layers": [10, 10, 10],
             "batch_norm": True}
    sensor_conf = [[r, phi, 0.0] for r, phi in SENSORS]
    save_setup(sensor_conf, "air", None, bundle, margs,
               tmp_path / "setup", model_input="by_channel")

    from onset_fingerprinting_tpu.realtime.main import build_engine

    engine = build_engine(tmp_path / "setup", sr=SR)
    assert engine.locator.model_input == "by_channel"
    n_serve = 10
    serve_on, serve_loc = synth_location_session(
        tmp_path / "serve", "serve0", n_hits=n_serve, sr=SR, seed=17,
        sensors=SENSORS, spacing=6000,
    )
    audio, _, _ = posd.load_session(tmp_path / "serve" / "serve0.json")
    n_matched, errs = _serve_errors(engine, audio, serve_on, serve_loc)
    assert n_matched >= 0.8 * n_serve, f"served {n_matched}/{n_serve}"
    med = float(np.median(errs))
    # full head: 96 training hits over a 35.6 cm disk → coarser than the
    # patch test, but must stay well below the predict-mean floor
    assert med < 4.0, f"serve median L1 {med:.2f} cm (errors {errs})"
    mean_pred = targets.mean(axis=0) * 100
    base = float(np.median([
        abs(mean_pred[0] - t[0]) + abs(mean_pred[1] - t[1])
        for t in serve_loc
    ]))
    assert med < 0.5 * base, (
        f"not clearly better than predict-mean ({med:.2f} vs {base:.2f})"
    )


@pytest.mark.slow
def test_zone_classifier_serve_journey(tmp_path):
    """Zone-classification serve journey: train a spectral CNN on labeled
    hits, attach it to the engine's on-device ring classifier, stream
    fresh audio, and classify the harvested hits — the reference's
    zone-model serving idea (torch model per located hit) through
    SURVEY §7's detect→locate→classify design.  Center vs rim hits on the
    modal drum (well-separated bands; the HARD adjacent-zone ceiling is
    characterized separately in examples/zone_classifier_demo.py)."""
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.core.config import (
        DetectorConfig,
        TrainConfig,
    )
    from onset_fingerprinting_tpu.data.synth import modal_hit
    from onset_fingerprinting_tpu.locate import Multilaterate3D
    from onset_fingerprinting_tpu.models import CNN, Trainer
    from onset_fingerprinting_tpu.realtime.engine import RealtimeEngine

    sensors = [(0.9, 0.0), (0.9, 120.0), (0.9, 240.0)]
    bands = [(0.06, 0.22), (0.68, 0.86)]  # center vs rim (r fractions)
    spacing, w, pre = 6000, 256, 64

    def zone_audio(seed, n_per_zone):
        rng = np.random.default_rng(seed)
        n = spacing * (2 * n_per_zone + 3)
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        onsets, zones = [], []
        for i in range(2 * n_per_zone):
            z = i % 2
            lo, hi = bands[z]
            r = float(np.sqrt(rng.uniform(lo**2, hi**2)))
            hit, delays = modal_hit(
                rng, r, float(rng.uniform(0, 360)), sensors=sensors,
                sr=SR, n=1024, velocity=float(rng.uniform(0.5, 1.0)),
            )
            base = spacing * (i + 1)
            audio[base : base + 1024] += hit
            onsets.append(base + int(round(delays.min())))
            zones.append(z)
        return audio, np.asarray(onsets), np.asarray(zones)

    def spectra(wins):  # [B, C, W] raw → [B, C, W/2+1] log magnitude
        return np.log1p(np.abs(np.fft.rfft(wins, axis=-1))).astype(
            np.float32
        )

    # 1. labeled training hits; train on log-|rfft| of onset windows with
    # shift augmentation matching serve-side onset jitter
    audio, onsets, zones = zone_audio(seed=21, n_per_zone=24)
    wins, y = [], []
    for shift in (-16, 0, 16):
        starts = onsets - pre + shift
        wins.append(np.stack([audio[s : s + w].T for s in starts]))
        y.append(zones)
    x_train = spectra(np.concatenate(wins))
    y_train = np.concatenate(y)

    cnn = CNN(output_size=2, layer_sizes=(8,), kernel_size=5,
              dropout_rate=0.0, pool=True)
    trainer = Trainer(cnn, TrainConfig(
        lr=3e-3, num_epochs=300, patience=300, loss="xent", seed=0,
    ))
    state = trainer.fit((x_train, y_train), epochs_per_step=50)
    train_acc = float(np.mean(
        np.argmax(trainer.predict(state, x_train), axis=1) == y_train
    ))
    assert train_acc > 0.9, f"train acc {train_acc:.2f}"

    # 2. serve fresh audio: detect→locate on the engine, classify hits
    # from the device ring via the attached model (spectral transform
    # embedded in a duck-typed apply so it runs inside the same dispatch)
    class SpectralCNN:
        def apply(self, params, raw):  # [K, C, W] from the ring
            f = jnp.log1p(jnp.abs(jnp.fft.rfft(raw, axis=-1)))
            return cnn.apply(params, f)

    cfg = DetectorConfig(
        n_channels=3, block_size=128, hipass_freq=0.0, sr=SR,
        on_threshold=0.45, off_threshold=0.45, cooldown=1323,
    )
    locator = Multilaterate3D(
        [[r, phi, 0.0] for r, phi in sensors], medium="air", sr=SR
    )
    engine = RealtimeEngine(cfg, locator)
    engine.attach_classifier(
        SpectralCNN(), {"params": state.params}, window=w, pre=pre,
        capacity=8,
    )
    s_audio, s_onsets, s_zones = zone_audio(seed=33, n_per_zone=8)
    warm = spacing  # lead-in noise before the first hit
    engine.warmup(s_audio[: warm - (warm % 128)])
    w0 = warm - (warm % 128)
    for i in range(w0 // 128, len(s_audio) // 128):
        engine.process(s_audio[i * 128 : (i + 1) * 128])
    events = engine.harvest()
    assert len(events) >= 0.8 * len(s_onsets), f"{len(events)} events"
    preds = np.argmax(engine.classify_hits(events), axis=1)
    # match events to truth by time (engine counts from the first
    # process() call — warmup does not write the ring)
    correct = total = 0
    for (onset, _loc), p in zip(events, preds):
        j = int(np.argmin(np.abs(s_onsets - (w0 + onset))))
        if abs(int(s_onsets[j]) - (w0 + onset)) < spacing // 2:
            total += 1
            correct += int(p == s_zones[j])
    acc = correct / max(total, 1)
    assert total >= 0.8 * len(s_onsets)
    assert acc >= 0.85, f"serve zone accuracy {acc:.2f} over {total} hits"
