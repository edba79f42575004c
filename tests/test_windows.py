"""Tests for on-device onset-window extraction (ops/windows.py)."""

import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.ops.windows import (
    compact_hit_list,
    compact_hits,
    gather_block_windows,
    gather_hit_windows,
    top_hit_blocks,
)


def _reference_windows(x, starts, cps, window, pre):
    t, c = x.shape
    s, k = starts.shape
    out = np.zeros((s, k, cps, window), np.float32)
    for i in range(s):
        for j in range(k):
            st = min(max(starts[i, j] - pre, 0), t - window) // 8 * 8
            out[i, j] = x[st : st + window, i * cps : (i + 1) * cps].T
    return out


def test_slab_path_matches_reference():
    """Wide (lane-multiple) channel counts use the slab+mask path."""
    rng = np.random.default_rng(0)
    t, s, cps, w, k = 4096, 64, 4, 256, 5  # C=256: two lane tiles
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w,
                             pre=64)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_pallas_gather_matches_reference():
    """DMA gather kernel (interpret mode) == slab/mask == numpy."""
    rng = np.random.default_rng(3)
    t, s, cps, w, k = 2048, 64, 4, 256, 3
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(
            jnp.asarray(x), jnp.asarray(starts), cps, w, 64,
            "pallas", True,
        )
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_fallback_path_matches_reference():
    """Narrow channel counts fall back to take_along_axis — same values."""
    rng = np.random.default_rng(1)
    t, s, cps, w, k = 2048, 3, 4, 128, 4  # C=12: not a lane multiple
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 0)
    )


def test_explicit_pallas_backend_rejects_narrow_layout():
    """backend='pallas' on a non-wide layout must raise, not silently run
    the ~15x slower narrow fallback the caller opted out of."""
    import pytest

    from onset_fingerprinting_tpu.ops.windows import gather_hit_windows

    rng = np.random.default_rng(1)
    t, s, cps, w, k = 2048, 3, 4, 128, 4  # C=12: not a lane multiple
    x = jnp.asarray(rng.normal(size=(t, s * cps)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, t, (s, k)).astype(np.int32))
    with pytest.raises(ValueError, match="wide layout"):
        gather_block_windows(x, starts, cps, w, backend="pallas")
    with pytest.raises(ValueError, match="wide layout"):
        gather_hit_windows(
            x,
            starts.reshape(-1),
            jnp.repeat(jnp.arange(s, dtype=jnp.int32), k),
            cps,
            w,
            backend="pallas",
        )


def test_clipping_at_edges():
    rng = np.random.default_rng(2)
    t, s, cps, w = 1024, 32, 4, 256
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = np.array([[0, t - 1]] * s, np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w,
                             pre=64)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_top_hit_blocks():
    nb, s, cps, k = 40, 3, 2, 4
    on = np.zeros((nb, s * cps), bool)
    # stream 0: 2 hits; stream 1: none; stream 2: 6 hits (capacity 4)
    on[3, 0] = True
    on[10, 1] = True
    for b in range(5, 35, 5):
        on[b, 4] = True
    starts, valid = top_hit_blocks(jnp.asarray(on), 128, s, k)
    starts, valid = np.asarray(starts), np.asarray(valid)
    assert valid.tolist() == [
        [True, True, False, False],
        [False, False, False, False],
        [True, True, True, True],
    ]
    assert starts[0, :2].tolist() == [3 * 128, 10 * 128]
    assert starts[2].tolist() == [5 * 128, 10 * 128, 15 * 128, 20 * 128]


def test_compact_hits_matches_dense_events():
    """Global compaction finds every hit, time-ordered, stream-tagged."""
    rng = np.random.default_rng(7)
    nb, s, cps = 60, 8, 2
    on = rng.random((nb, s * cps)) < 0.04
    hit = on.reshape(nb, s, cps).any(-1)
    expected = [
        (b, st) for b in range(nb) for st in range(s) if hit[b, st]
    ]
    g = len(expected) + 3  # slack capacity
    starts, sids, valid, dropped = compact_hits(jnp.asarray(on), 128, s, g)
    starts, sids, valid = map(np.asarray, (starts, sids, valid))
    assert int(dropped) == 0
    assert valid.sum() == len(expected)
    got = [
        (starts[i] // 128, sids[i]) for i in range(g) if valid[i]
    ]
    assert got == expected  # global time order, stream-tagged
    # invalid tail slots are zeroed
    assert starts[valid.sum():].tolist() == [0] * 3


def test_compact_hits_overflow_counted():
    """Hits beyond capacity are dropped and counted — never silently."""
    nb, s = 20, 4
    on = np.ones((nb, s), bool)  # cps=1: 80 hits
    starts, sids, valid, dropped = compact_hits(jnp.asarray(on), 64, s, 10)
    assert int(dropped) == 70
    assert int(np.asarray(valid).sum()) == 10
    # first 10 in time-major order: blocks 0,0,0,0,1,1,1,1,2,2
    assert np.asarray(starts).tolist() == [0] * 4 + [64] * 4 + [128] * 2


def test_compact_hit_list_matches_padded_slots():
    """Two-level compaction keeps exactly the valid padded slots
    (stream-major order) and counts overflow."""
    rng = np.random.default_rng(17)
    s, k = 16, 5
    starts = (rng.integers(0, 100, (s, k)) * 128).astype(np.int32)
    valid = rng.random((s, k)) < 0.3
    expected = [
        (si, starts[si, j])
        for si in range(s)
        for j in range(k)
        if valid[si, j]
    ]
    g = len(expected) + 2
    st, sid, v, dropped = compact_hit_list(
        jnp.asarray(starts), jnp.asarray(valid), g
    )
    st, sid, v = map(np.asarray, (st, sid, v))
    assert int(dropped) == 0
    assert v.sum() == len(expected)
    assert [(sid[i], st[i]) for i in range(v.sum())] == expected
    # overflow: capacity below the hit count drops and counts
    g2 = len(expected) - 3
    st2, sid2, v2, dropped2 = compact_hit_list(
        jnp.asarray(starts), jnp.asarray(valid), g2
    )
    assert int(dropped2) == 3
    assert int(np.asarray(v2).sum()) == g2
    assert [
        (int(np.asarray(sid2)[i]), int(np.asarray(st2)[i]))
        for i in range(g2)
    ] == expected[:g2]


def _hit_list_reference(x, starts, sids, cps, window, pre):
    t = x.shape[0]
    out = np.zeros((len(starts), cps, window), np.float32)
    for i, (st, s) in enumerate(zip(starts, sids)):
        r = min(max(st - pre, 0), t - window) // 8 * 8
        out[i] = x[r : r + window, s * cps : (s + 1) * cps].T
    return out


def test_gather_hit_windows_wide_and_narrow():
    """Compacted gather == per-hit numpy reference on all three backends."""
    rng = np.random.default_rng(11)
    t, window, pre = 4096, 256, 64
    for s, cps in ((64, 4), (3, 4)):  # wide (C=256) and narrow (C=12)
        x = rng.normal(size=(t, s * cps)).astype(np.float32)
        n = 17
        starts = (rng.integers(0, t // 128, n) * 128).astype(np.int32)
        sids = rng.integers(0, s, n).astype(np.int32)
        ref = _hit_list_reference(x, starts, sids, cps, window, pre)
        got = np.asarray(
            gather_hit_windows(
                jnp.asarray(x), jnp.asarray(starts), jnp.asarray(sids),
                cps, window, pre,
            )
        )
        np.testing.assert_array_equal(got, ref)
        if s * cps % 128 == 0:
            got_p = np.asarray(
                gather_hit_windows(
                    jnp.asarray(x), jnp.asarray(starts), jnp.asarray(sids),
                    cps, window, pre, "pallas", True,
                )
            )
            np.testing.assert_array_equal(got_p, ref)


def test_compacted_pipeline_matches_padded():
    """compact_hits + gather_hit_windows == top_hit_blocks +
    gather_block_windows on the valid slots (same windows, 3x fewer)."""
    rng = np.random.default_rng(13)
    t, s, cps, w, pre = 8192, 32, 4, 256, 64
    nb = t // 128
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    on = rng.random((nb, s * cps)) < 0.01
    on[-2:] = False  # keep windows in range
    k = 8
    st_p, v_p = top_hit_blocks(jnp.asarray(on), 128, s, k)
    win_p = gather_block_windows(jnp.asarray(x), st_p, cps, w, pre)
    st_g, sid_g, v_g, dropped = compact_hits(jnp.asarray(on), 128, s, 128)
    win_g = gather_hit_windows(
        jnp.asarray(x), st_g, sid_g, cps, w, pre
    )
    assert int(dropped) == 0
    st_p, v_p, win_p = map(np.asarray, (st_p, v_p, win_p))
    st_g, sid_g, v_g, win_g = map(np.asarray, (st_g, sid_g, v_g, win_g))
    padded = {
        (s_i, st_p[s_i, j]): win_p[s_i, j]
        for s_i in range(s)
        for j in range(k)
        if v_p[s_i, j]
    }
    n_valid = v_g.sum()
    assert n_valid == len(padded)
    for i in range(n_valid):
        np.testing.assert_array_equal(
            win_g[i], padded[(sid_g[i], st_g[i])]
        )


def test_precision_knob_accepted_both_gathers():
    """precision=DEFAULT plumbs through both gather entry points.

    On CPU f32 matmuls are exact at any precision, so values must match
    the HIGHEST default bit-for-bit; on TPU, DEFAULT trades the 3-pass
    bit-exact lane select for one bf16 MXU pass (serving-model path)."""
    import jax

    rng = np.random.default_rng(7)
    t, s, cps, w, k = 2048, 64, 4, 256, 3
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    hi = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w,
                             pre=64)
    )
    lo = np.asarray(
        gather_block_windows(
            jnp.asarray(x), jnp.asarray(starts), cps, w, 64, "pallas",
            True, jax.lax.Precision.DEFAULT,
        )
    )
    np.testing.assert_array_equal(hi, lo)
    flat_starts = jnp.asarray(starts[:, 0])
    sids = jnp.arange(s, dtype=jnp.int32)
    hi_f = np.asarray(
        gather_hit_windows(jnp.asarray(x), flat_starts, sids, cps, w, 64)
    )
    lo_f = np.asarray(
        gather_hit_windows(
            jnp.asarray(x), flat_starts, sids, cps, w, 64, "pallas",
            True, jax.lax.Precision.DEFAULT,
        )
    )
    np.testing.assert_array_equal(hi_f, lo_f)


def test_multi_hit_gather_padding():
    """The grouped (hits_per_step=8) kernel pads hit counts that don't
    divide the group size; padded slots must not leak into the output."""
    rng = np.random.default_rng(11)
    t, s, cps, w, n = 2048, 64, 4, 256, 41  # 41 % 8 != 0
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = (rng.integers(0, (t - w) // 8, n) * 8).astype(np.int32)
    sids = rng.integers(0, s, n).astype(np.int32)
    ref = np.asarray(
        gather_hit_windows(
            jnp.asarray(x), jnp.asarray(starts), jnp.asarray(sids),
            cps, w, 0, "xla",
        )
    )
    for h in (1, 4, 8):
        got = np.asarray(
            gather_hit_windows(
                jnp.asarray(x), jnp.asarray(starts), jnp.asarray(sids),
                cps, w, 0, "pallas", True,
                hits_per_step=h,
            )
        )
        np.testing.assert_array_equal(got, ref)


def _reference_windows_anchored(x, starts, stream_ids, cps, window, pre):
    t, c = x.shape
    out = np.zeros((len(starts), cps, window), np.float32)
    for i, (st, sid) in enumerate(zip(starts, stream_ids)):
        e = min(max(st - pre, 0), t - window - 8)
        out[i] = x[e : e + window, sid * cps : (sid + 1) * cps].T
    return out


def test_anchored_gather_exact_across_backends():
    """anchored=True extracts windows at EXACT sample starts (no 8-sample
    flooring) on every backend: pallas interpret, XLA wide slab, and the
    narrow fallback all equal the direct numpy slice, for every residual
    0..7 (the reference anchors exactly at the labelled onset,
    data.py:55-120)."""
    rng = np.random.default_rng(7)
    t, s, cps, w = 2048, 32, 4, 256
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    # one start per residual class, plus random ones and edge cases
    starts = np.array(
        [512 + r for r in range(8)]
        + list(rng.integers(0, t, 20))
        + [0, 3, t - 1, t - w],
        np.int32,
    )
    sids = rng.integers(0, s, len(starts)).astype(np.int32)
    want = _reference_windows_anchored(x, starts, sids, cps, w, pre=64)
    for backend, interp in (("pallas", True), ("xla", False)):
        got = np.asarray(
            gather_hit_windows(
                jnp.asarray(x), jnp.asarray(starts), jnp.asarray(sids),
                cps, w, 64, backend, interp, anchored=True,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=backend)
    # narrow layout (C not a lane multiple) exercises the fallback
    xn = x[:, : 3 * cps]
    sids_n = np.minimum(sids, 2)
    want_n = _reference_windows_anchored(xn, starts, sids_n, cps, w, 64)
    got_n = np.asarray(
        gather_hit_windows(
            jnp.asarray(xn), jnp.asarray(starts), jnp.asarray(sids_n),
            cps, w, 64, anchored=True,
        )
    )
    np.testing.assert_array_equal(got_n, want_n)


def test_anchored_block_windows_match_flat():
    """gather_block_windows(anchored=True) == per-hit anchored gather."""
    rng = np.random.default_rng(8)
    t, s, cps, w, k = 2048, 32, 4, 128, 3
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    sids = np.repeat(np.arange(s, dtype=np.int32), k)
    want = _reference_windows_anchored(
        x, starts.reshape(-1), sids, cps, w, pre=32
    ).reshape(s, k, cps, w)
    got = np.asarray(
        gather_block_windows(
            jnp.asarray(x), jnp.asarray(starts), cps, w, 32,
            anchored=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_anchored_removes_block_jitter():
    """The block-aligned gather's onset position jitters by the within-
    block delta; the anchored gather pins the onset to index ``pre``
    EXACTLY.  A marker sample placed at the onset must appear at
    windows[:, :, pre] for every delta."""
    t, s, cps, w, pre, bsz = 4096, 32, 4, 256, 64, 128
    x = np.zeros((t, s * cps), np.float32)
    onsets = np.array([1024 + 17 * i for i in range(s)], np.int32)
    for sid, onset in enumerate(onsets):
        x[onset, sid * cps : (sid + 1) * cps] = 1.0
    sids = np.arange(s, dtype=np.int32)
    anchored = np.asarray(
        gather_hit_windows(
            jnp.asarray(x), jnp.asarray(onsets), jnp.asarray(sids),
            cps, w, pre, anchored=True,
        )
    )
    assert (anchored[:, :, pre] == 1.0).all()
    # block-aligned: the marker lands at pre + (onset % bsz) instead
    block_starts = onsets // bsz * bsz
    aligned = np.asarray(
        gather_hit_windows(
            jnp.asarray(x), jnp.asarray(block_starts), jnp.asarray(sids),
            cps, w, pre,
        )
    )
    for i, onset in enumerate(onsets):
        assert aligned[i, 0, pre + onset % bsz] == 1.0


def test_top_hit_blocks_anchored_starts():
    """With the detector's deltas, top_hit_blocks returns exact onset
    samples: block*bsz + the earliest firing channel's offset."""
    nb, s, cps, k, bsz = 40, 3, 2, 4, 128
    on = np.zeros((nb, s * cps), bool)
    deltas = np.zeros((nb, s * cps), np.int32)
    on[3, 0] = True
    deltas[3, 0] = 17
    # both channels fire: the EARLIEST offset anchors
    on[10, 0] = on[10, 1] = True
    deltas[10, 0], deltas[10, 1] = 90, 41
    on[5, 4] = True
    deltas[5, 4] = 127
    starts, valid = top_hit_blocks(
        jnp.asarray(on), bsz, s, k, jnp.asarray(deltas)
    )
    starts, valid = np.asarray(starts), np.asarray(valid)
    assert starts[0, 0] == 3 * bsz + 17
    assert starts[0, 1] == 10 * bsz + 41
    assert starts[2, 0] == 5 * bsz + 127
    # block-aligned behavior unchanged without deltas
    st0, v0 = top_hit_blocks(jnp.asarray(on), bsz, s, k)
    assert np.asarray(st0)[0, 0] == 3 * bsz
    np.testing.assert_array_equal(np.asarray(v0), valid)
