"""Pallas fused-detector kernel golden tests (interpret mode on CPU; the
compiled path is exercised by bench.py on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.detect.amplitude import (
    detect_offline,
    detector_init,
)
from onset_fingerprinting_tpu.ops.pallas_detector import make_pallas_detector


def synth(T, C, seed=0, spacing=1900):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1e-4, (T, C)).astype(np.float32)
    t = np.arange(600)
    burst = (np.sin(2 * np.pi * 5000 / 96000 * t) * np.exp(-t / 120) * 0.5)
    for base in range(2000, T - 700, spacing):
        x[base : base + 600] += burst[:, None].astype(np.float32)
    return x


@pytest.mark.parametrize("hipass", [0.0, 2000.0])
def test_kernel_matches_scan_detector(hipass):
    T, C = 128 * 50, 3
    x = synth(T, C)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=hipass, sr=96000
    )
    static, params, state = detector_init(cfg)
    _, (on_ref, d_ref, rel_ref) = detect_offline(
        static, params, state, jnp.asarray(x)
    )
    _, _, pstate, run = make_pallas_detector(cfg, interpret=True)
    new_state, (on, d, rel) = run(pstate, jnp.asarray(x))
    on, d = np.asarray(on), np.asarray(d)
    on_ref, d_ref = np.asarray(on_ref), np.asarray(d_ref)
    np.testing.assert_array_equal(on, on_ref)
    np.testing.assert_array_equal(d[on_ref], d_ref[on_ref])
    # exp2/log2 vs 10**x/log10 fp32 differences stay tiny
    np.testing.assert_allclose(
        np.asarray(rel), np.asarray(rel_ref), atol=2e-2
    )


def test_kernel_streaming_state_carries():
    """Two sequential kernel calls == one long call (streaming contract)."""
    T, C = 128 * 40, 2
    x = synth(T, C, seed=3)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=0.0, sr=96000
    )
    _, _, state, run = make_pallas_detector(cfg, interpret=True)
    _, (on_full, d_full, _) = run(state, jnp.asarray(x))
    st = state
    ons = []
    half = T // 2
    for seg in (x[:half], x[half:]):
        st, (on, d, _) = run(st, jnp.asarray(seg))
        ons.append(np.asarray(on))
    np.testing.assert_array_equal(
        np.concatenate(ons), np.asarray(on_full)
    )


def test_kernel_channel_padding_inert():
    """Padding channels to the 128-lane tile must not change detections."""
    T = 128 * 30
    x = synth(T, 2, seed=5)
    cfg = DetectorConfig(
        n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
    )
    _, _, state, run = make_pallas_detector(cfg, interpret=True)
    _, (on, d, rel) = run(state, jnp.asarray(x))
    assert np.asarray(on).shape == (30, 2)
    assert np.asarray(rel).shape == (T, 2)
    # detections happen on both real channels
    assert np.asarray(on).sum() > 0


def test_events_only_mode_matches():
    """emit_rel=False must produce identical events with no rel output."""
    T, C = 128 * 40, 3
    x = synth(T, C, seed=7)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=2000.0, sr=96000
    )
    _, _, state, run_full = make_pallas_detector(cfg, interpret=True)
    _, _, _, run_ev = make_pallas_detector(
        cfg, interpret=True, emit_rel=False
    )
    _, (on1, d1, rel1) = run_full(state, jnp.asarray(x))
    st2, (on2, d2, rel2) = run_ev(state, jnp.asarray(x))
    assert rel2 is None and rel1 is not None
    np.testing.assert_array_equal(np.asarray(on1), np.asarray(on2))
    np.testing.assert_array_equal(
        np.asarray(d1)[np.asarray(on1)], np.asarray(d2)[np.asarray(on1)]
    )
    # streaming state still returned
    assert np.isfinite(np.asarray(st2.fast)).all()


def test_wide_channels_tile_chunking(monkeypatch):
    """Channel widths above MAX_TILES_PER_CALL split into multiple kernel
    calls (uncoupled off-gate); events must match the single-call result."""
    import onset_fingerprinting_tpu.ops.pallas_detector as pd

    T, C = 128 * 40, 300  # 3 lane tiles
    x = synth(T, C, seed=17)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=2000.0, sr=96000,
        coupled_off_gate=False,
    )
    _, _, state, run = make_pallas_detector(cfg, interpret=True)
    _, (on_1call, d_1call, _) = run(state, jnp.asarray(x))
    monkeypatch.setattr(pd, "MAX_TILES_PER_CALL", 1)
    pd.pallas_detect_offline.clear_cache()
    _, _, state2, run2 = make_pallas_detector(cfg, interpret=True)
    new_state, (on, d, rel) = run2(state2, jnp.asarray(x))
    pd.pallas_detect_offline.clear_cache()
    on, d = np.asarray(on), np.asarray(d)
    np.testing.assert_array_equal(on, np.asarray(on_1call))
    np.testing.assert_array_equal(
        d[np.asarray(on_1call)], np.asarray(d_1call)[np.asarray(on_1call)]
    )
    assert on.sum() > 0
    assert np.asarray(rel).shape == (T, C)
    assert np.isfinite(np.asarray(new_state.fast)).all()


def test_wide_channels_chunking_with_backtrack(monkeypatch):
    """Tile chunking must slice the backtrack history per chunk: events
    exactly equal; deltas equal except knife-edge walk sites.

    The scan and Pallas programs produce rel envelopes identical only to
    float32-fusion tolerance (XLA forms FMAs differently per program), and
    the backtracking walk compares smoothed floats against a tolerance —
    so on a wide fixture a small fraction of walks may stop one EMA step
    apart.  The walk ALGORITHM is exact: a numpy replay of the kernel walk
    on the kernel's own rel history reproduces its deltas (596/600 on this
    fixture, the rest numpy-vs-XLA FMA noise)."""
    import onset_fingerprinting_tpu.ops.pallas_detector as pd

    T, C = 128 * 40, 300
    x = synth(T, C, seed=19)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=2000.0, sr=96000,
        coupled_off_gate=False, backtrack=True, backtrack_buffer_size=256,
    )
    static, params, state = detector_init(cfg)
    _, (on_ref, d_ref, _) = detect_offline(static, params, state, jnp.asarray(x))
    monkeypatch.setattr(pd, "MAX_TILES_PER_CALL", 1)
    pd.pallas_detect_offline.clear_cache()
    _, _, pstate, run = make_pallas_detector(cfg, interpret=True)
    _, (on, d, _) = run(pstate, jnp.asarray(x))
    pd.pallas_detect_offline.clear_cache()
    on, d = np.asarray(on), np.asarray(d)
    on_ref, d_ref = np.asarray(on_ref), np.asarray(d_ref)
    np.testing.assert_array_equal(on, on_ref)
    n_fired = int(on_ref.sum())
    assert n_fired > 0
    exact = int((d[on_ref] == d_ref[on_ref]).sum())
    assert exact >= 0.97 * n_fired, (exact, n_fired)


@pytest.mark.parametrize("bt_size", [128, 256])
def test_backtracking_matches_scan(bt_size):
    # bt_size < block_size is rejected at init (the reference asserts the
    # same, detection.py:716-718) — raise pinned in
    # test_detect.py::test_backtrack_buffer_smaller_than_block_raises
    """Pallas backtracking walk == scan-path _backtrack on this fixture.

    Exact equality holds at this size empirically; it is NOT a general
    contract — rel differs between the two programs at fusion/FMA ulp
    level, and knife-edge walks may stop one EMA step apart (see
    test_wide_channels_chunking_with_backtrack)."""
    T, C = 128 * 50, 3
    x = synth(T, C, seed=11)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=2000.0, sr=96000,
        backtrack=True, backtrack_buffer_size=bt_size,
        backtrack_smooth_size=5,
    )
    static, params, state = detector_init(cfg)
    _, (on_ref, d_ref, _) = detect_offline(static, params, state, jnp.asarray(x))
    _, _, pstate, run = make_pallas_detector(cfg, interpret=True)
    _, (on, d, _) = run(pstate, jnp.asarray(x))
    on, d = np.asarray(on), np.asarray(d)
    on_ref, d_ref = np.asarray(on_ref), np.asarray(d_ref)
    np.testing.assert_array_equal(on, on_ref)
    np.testing.assert_array_equal(d[on_ref], d_ref[on_ref])
    assert on_ref.sum() > 0
    # backtracking must actually move some onsets earlier than the raw
    # threshold-crossing index would be
    cfg_nobt = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=2000.0, sr=96000,
        backtrack=False,
    )
    s2, p2, st2 = detector_init(cfg_nobt)
    _, (on_nb, d_nb, _) = detect_offline(s2, p2, st2, jnp.asarray(x))
    assert (d[on_ref] < np.asarray(d_nb)[on_ref]).any()


def test_backtracking_streaming_state_carries():
    """Backtrack history must persist across kernel calls: an onset right at
    a call boundary backtracks into the previous call's samples."""
    T, C = 128 * 40, 2
    x = synth(T, C, seed=13)
    cfg = DetectorConfig(
        n_channels=C, block_size=128, hipass_freq=0.0, sr=96000,
        backtrack=True, backtrack_buffer_size=256,
    )
    _, _, state, run = make_pallas_detector(cfg, interpret=True)
    _, (on_full, d_full, _) = run(state, jnp.asarray(x))
    st = state
    ons, ds = [], []
    half = T // 2
    for seg in (x[:half], x[half:]):
        st, (on, d, _) = run(st, jnp.asarray(seg))
        ons.append(np.asarray(on))
        ds.append(np.asarray(d))
    on_cat, d_cat = np.concatenate(ons), np.concatenate(ds)
    on_full, d_full = np.asarray(on_full), np.asarray(d_full)
    np.testing.assert_array_equal(on_cat, on_full)
    np.testing.assert_array_equal(d_cat[on_full], d_full[on_full])
