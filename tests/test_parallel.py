"""Multi-device sharding tests on the virtual 8-device CPU mesh:
data-parallel detection, halo time-sharding, DP training, graft entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.core.config import DetectorConfig, TrainConfig
from onset_fingerprinting_tpu.detect.amplitude import (
    detect_offline,
    detector_init,
)
from onset_fingerprinting_tpu.parallel import (
    default_mesh,
    detect_offline_sharded,
    detect_offline_time_sharded,
    make_mesh,
)
from onset_fingerprinting_tpu.parallel.sharding import events_from_dense


def synth(T, C, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1e-4, (T, C)).astype(np.float32)
    t = np.arange(600)
    burst = (np.sin(2 * np.pi * 5000 / 96000 * t) * np.exp(-t / 120) * 0.5)
    for base in range(3000, T - 700, 6000):
        x[base : base + 600] += burst[:, None].astype(np.float32)
    return x


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,), ("data",))


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh((4, 2), ("data", "model"))
        assert m.shape == {"data": 4, "model": 2}
        d = default_mesh(8, model_parallel=2)
        assert d.shape == {"data": 4, "model": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh((100,), ("data",))


class TestShardedDetection:
    def test_batch_sharded_matches_single(self, mesh):
        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        xs = np.stack([synth(128 * 40, 2, seed=i) for i in range(8)])
        on_s, d_s, rel_s = detect_offline_sharded(
            static, params, state, jnp.asarray(xs), mesh
        )
        for i in range(0, 8, 3):
            _, (on, d, _) = detect_offline(
                static, params, state, jnp.asarray(xs[i])
            )
            np.testing.assert_array_equal(np.asarray(on_s)[i], np.asarray(on))
            fired = np.asarray(on)
            np.testing.assert_array_equal(
                np.asarray(d_s)[i][fired], np.asarray(d)[fired]
            )

    def test_time_sharded_matches_sequential_exactly(self, mesh):
        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        T = 128 * 80 * 8
        x = synth(T, 2, seed=4)
        on_t, d_t, _ = detect_offline_time_sharded(
            static, params, state, jnp.asarray(x), mesh, halo=128 * 60
        )
        _, (on_ref, d_ref, _) = detect_offline(
            static, params, state, jnp.asarray(x)
        )
        ch_t, ev_t = events_from_dense(on_t, d_t, 128)
        ch_r, ev_r = events_from_dense(np.asarray(on_ref), np.asarray(d_ref), 128)
        # with halo >= warmup horizon the overlap-discard scheme is exact:
        # every segment's carried state has converged before its kept region
        set_t = set(zip(ch_t, ev_t))
        set_r = set(zip(ch_r, ev_r))
        assert set_t == set_r
        assert len(set_r) > 0

    def test_time_sharded_keeps_trailing_samples(self, mesh):
        """T not divisible by n_dev*block must NOT silently drop the tail:
        an onset inside the final ragged region (which the old floor
        truncation discarded) is still detected, exactly as sequentially."""
        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        T = 128 * 80 * 8 + 1000  # 1000 ragged samples past the 8-dev floor
        x = synth(T, 2, seed=5)
        # clear synth's tail burst (its cooldown would mask ours), then put
        # a burst entirely inside the region the old code truncated away
        x[80600:] = (
            np.random.default_rng(9)
            .normal(0, 1e-4, (T - 80600, 2))
            .astype(np.float32)
        )
        t = np.arange(300)
        burst = np.sin(2 * np.pi * 5000 / 96000 * t) * np.exp(-t / 60) * 0.5
        x[82400:82700] += burst[:, None].astype(np.float32)
        on_t, d_t, _ = detect_offline_time_sharded(
            static, params, state, jnp.asarray(x), mesh, halo=128 * 60
        )
        # detect_offline wants whole blocks; the sharded path must match
        # this exact whole-block semantics (drop < block_size, never more)
        _, (on_ref, d_ref, _) = detect_offline(
            static, params, state, jnp.asarray(x[: (T // 128) * 128])
        )
        assert on_t.shape[0] == T // 128  # sequential whole-block count
        ch_t, ev_t = events_from_dense(on_t, d_t, 128)
        ch_r, ev_r = events_from_dense(
            np.asarray(on_ref), np.asarray(d_ref), 128
        )
        set_t = set(zip(ch_t, ev_t))
        set_r = set(zip(ch_r, ev_r))
        assert set_t == set_r
        assert any(ev >= T - 1000 for ev in ev_r), "fixture must hit tail"

        from onset_fingerprinting_tpu.parallel.sharding import (
            detect_events_time_sharded,
        )

        chans, onsets = detect_events_time_sharded(
            static, params, state, jnp.asarray(x), mesh, halo=128 * 60
        )
        assert set(zip(chans.tolist(), onsets.tolist())) == set_r


class TestTrainerDP:
    def test_dp_training_step_runs(self, mesh):
        from onset_fingerprinting_tpu.models import CNN, Trainer

        cfg = TrainConfig(lr=1e-3, num_epochs=3, patience=10)
        trainer = Trainer(
            CNN(output_size=2, layer_sizes=[4]), cfg, mesh=mesh
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 3, 32)).astype(np.float32)
        y = rng.normal(size=(16, 2)).astype(np.float32)
        state = trainer.fit((x, y))
        assert len(trainer.history["train_loss"]) == 3


class TestGraftEntry:
    def test_entry_and_dryrun(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 2)
        g.dryrun_multichip(8)


class TestPallasTimeSharded:
    def test_kernel_under_shard_map_matches(self, mesh):
        """The fused Pallas detector under shard_map halo time-sharding must
        reproduce the sequential scan detector's events."""
        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        T = 128 * 80 * 8
        x = synth(T, 2, seed=4)
        on_t, d_t, _ = detect_offline_time_sharded(
            static, params, state, jnp.asarray(x), mesh, halo=128 * 60,
            backend="pallas", interpret=True,
        )
        _, (on_r, d_r, _) = detect_offline(
            static, params, state, jnp.asarray(x)
        )
        set_t = set(zip(*events_from_dense(on_t, d_t, 128)))
        set_r = set(zip(*events_from_dense(
            np.asarray(on_r), np.asarray(d_r), 128)))
        assert set_t == set_r
        assert len(set_r) > 0


class TestShardedPallasBackend:
    def test_batch_sharded_pallas_matches_scan(self, mesh):
        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000,
            coupled_off_gate=False,
        )
        static, params, state = detector_init(cfg)
        xs = np.stack([synth(128 * 30, 2, seed=i) for i in range(8)])
        on_p, d_p, _ = detect_offline_sharded(
            static, params, state, jnp.asarray(xs), mesh,
            backend="pallas", interpret=True,
        )
        on_s, d_s, _ = detect_offline_sharded(
            static, params, state, jnp.asarray(xs), mesh
        )
        np.testing.assert_array_equal(np.asarray(on_p), np.asarray(on_s))
        fired = np.asarray(on_s)
        np.testing.assert_array_equal(
            np.asarray(d_p)[fired], np.asarray(d_s)[fired]
        )
        assert fired.sum() > 0


class TestDistributedInit:
    def test_noop_single_process(self, monkeypatch):
        from onset_fingerprinting_tpu.parallel import (
            init_distributed,
            pod_env_detected,
        )

        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "OFT_DISTRIBUTED"):
            monkeypatch.delenv(k, raising=False)
        assert not pod_env_detected()
        # no env markers, no explicit coordinator → no-op
        assert init_distributed() is False

    def test_global_mesh(self):
        from onset_fingerprinting_tpu.parallel import global_mesh

        m = global_mesh()
        assert m.devices.size == len(jax.devices())
        m2 = global_mesh((4, 2), ("data", "model"))
        assert m2.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            global_mesh((1000,))


class TestEventAggregation:
    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_all_gather_matches_sequential(self, mesh, backend):
        """Time-sharded detect + on-device all_gather of event queues must
        reproduce the sequential detector's global event set; grouping then
        runs on the aggregated events."""
        from onset_fingerprinting_tpu.detect.grouping import find_onset_groups
        from onset_fingerprinting_tpu.parallel import (
            detect_events_time_sharded,
        )

        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        T = 128 * 80 * 8
        x = synth(T, 2, seed=4)
        chans, onsets = detect_events_time_sharded(
            static, params, state, jnp.asarray(x), mesh, halo=128 * 60,
            backend=backend, interpret=True,
        )
        _, (on_r, d_r, _) = detect_offline(static, params, state,
                                           jnp.asarray(x))
        from onset_fingerprinting_tpu.parallel.sharding import (
            events_from_dense,
        )

        ch_r, ev_r = events_from_dense(
            np.asarray(on_r), np.asarray(d_r), 128
        )
        assert set(zip(chans, onsets)) == set(zip(ch_r, ev_r))
        assert len(ev_r) > 0
        # aggregated events feed grouping directly (all channels hit at
        # roughly the same sample in the synth fixture)
        groups = find_onset_groups(onsets, chans, max_distance=256,
                                   min_channels=2)
        assert groups is not None and len(groups) > 0

    def test_overflow_reports_dropped(self, mesh):
        """Event-queue overflow must not be silent: a warning names the
        per-segment drop counts and ``return_dropped`` surfaces them."""
        import warnings as _warnings

        from onset_fingerprinting_tpu.parallel import (
            detect_events_time_sharded,
        )

        cfg = DetectorConfig(
            n_channels=2, block_size=128, hipass_freq=0.0, sr=96000
        )
        static, params, state = detector_init(cfg)
        T = 128 * 80 * 8
        x = synth(T, 2, seed=4)
        # capacity=2 < events per segment in this fixture → overflow
        with pytest.warns(UserWarning, match="dropped"):
            chans, onsets, dropped = detect_events_time_sharded(
                static, params, state, jnp.asarray(x), mesh,
                halo=128 * 60, capacity=2, return_dropped=True,
            )
        assert dropped.shape == (8,)
        assert dropped.sum() > 0
        # every surviving queue holds exactly `capacity` events where raw
        # count exceeded it
        _, (on_r, d_r, _) = detect_offline(
            static, params, state, jnp.asarray(x)
        )
        ch_r, ev_r = events_from_dense(np.asarray(on_r), np.asarray(d_r),
                                       128)
        assert len(onsets) + dropped.sum() == len(ev_r)
        # kept events are the EARLIEST per segment → still a subset of the
        # sequential event set
        assert set(zip(chans, onsets)) <= set(zip(ch_r, ev_r))
        # ample capacity → no drops, no warning
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            _, _, dropped0 = detect_events_time_sharded(
                static, params, state, jnp.asarray(x), mesh,
                halo=128 * 60, capacity=64, return_dropped=True,
            )
        assert dropped0.sum() == 0


class TestDetectFingerprintSharded:
    def test_full_pipeline_matches_unsharded(self, mesh):
        """Sharded detect→gather→fingerprint == the same pipeline run
        unsharded per stream."""
        from flax import linen as nn

        from onset_fingerprinting_tpu.ops.windows import (
            gather_block_windows,
            top_hit_blocks,
        )
        from onset_fingerprinting_tpu.parallel.sharding import (
            detect_fingerprint_sharded,
        )

        T, C, S, W, K = 128 * 30, 2, 8, 128, 4
        streams = np.stack([synth(T, C, seed=100 + i) for i in range(S)])
        cfg = DetectorConfig(
            n_channels=C, block_size=128, hipass_freq=0.0, sr=96000,
            coupled_off_gate=False,
        )
        static, params, state = detector_init(cfg)

        class Head(nn.Module):
            @nn.compact
            def __call__(self, x):  # [B, C, W]
                return nn.Dense(2)(x.reshape(x.shape[0], -1))

        model = Head()
        mp = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, C, W), jnp.float32)
        )
        preds, starts, valid, dropped = detect_fingerprint_sharded(
            static, params, state, jnp.asarray(streams), mesh, model, mp,
            window=W, pre=32, capacity=K,
        )
        preds, starts, valid = map(np.asarray, (preds, starts, valid))
        assert valid.any()
        # non-compacted route: drop counts exist and are all zero
        assert np.asarray(dropped).shape == (mesh.devices.size,)
        assert not np.asarray(dropped).any()
        # per-stream reference: unsharded detect + same gather + same model
        for s in range(S):
            _, (on, d, _) = detect_offline(
                static, params, state, jnp.asarray(streams[s])
            )
            st_ref, v_ref = top_hit_blocks(jnp.asarray(np.asarray(on)), 128, 1, K)
            np.testing.assert_array_equal(valid[s], np.asarray(v_ref)[0])
            np.testing.assert_array_equal(starts[s], np.asarray(st_ref)[0])
            wins = gather_block_windows(
                jnp.asarray(streams[s]), st_ref, C, W, 32
            )
            p_ref = model.apply(mp, np.asarray(wins)[0])
            p_ref = np.where(
                np.asarray(v_ref)[0][:, None], np.asarray(p_ref), 0.0
            )
            np.testing.assert_allclose(preds[s], p_ref, atol=1e-5)

        # wide (zero-transpose) layout must match the stream layout
        wide = np.moveaxis(streams, 0, 1).reshape(T, S * C)
        preds_w, starts_w, valid_w, _ = detect_fingerprint_sharded(
            static, params, state, jnp.asarray(wide), mesh, model, mp,
            window=W, pre=32, capacity=K, layout="wide",
            channels_per_stream=C,
        )
        np.testing.assert_array_equal(np.asarray(valid_w), valid)
        np.testing.assert_array_equal(np.asarray(starts_w), starts)
        np.testing.assert_allclose(np.asarray(preds_w), preds, atol=1e-6)

        # compacted gather+model route: identical padded output contract
        preds_c, starts_c, valid_c, dropped_c = detect_fingerprint_sharded(
            static, params, state, jnp.asarray(streams), mesh, model, mp,
            window=W, pre=32, capacity=K,
            compact_capacity=K * S,  # ample: no drops
        )
        np.testing.assert_array_equal(np.asarray(valid_c), valid)
        np.testing.assert_array_equal(np.asarray(starts_c), starts)
        np.testing.assert_allclose(np.asarray(preds_c), preds, atol=1e-5)
        assert not np.asarray(dropped_c).any()

        # under-budget compaction: overflow slots masked invalid AND
        # counted per device, not silently zero-predicted as valid
        preds_u, _, valid_u, dropped_u = detect_fingerprint_sharded(
            static, params, state, jnp.asarray(streams), mesh, model, mp,
            window=W, pre=32, capacity=K, compact_capacity=1,
        )
        valid_u = np.asarray(valid_u)
        # every device's overflow beyond its 1-slot budget is counted
        per_dev_hits = valid.reshape(mesh.devices.size, -1).sum(axis=1)
        np.testing.assert_array_equal(
            np.asarray(dropped_u), np.maximum(per_dev_hits - 1, 0)
        )
        # per device at most 1 hit kept
        n_dev = mesh.devices.size
        per_dev = S // n_dev
        for dd in range(n_dev):
            sl = valid_u[dd * per_dev : (dd + 1) * per_dev]
            assert sl.sum() <= 1
        kept = valid_u & valid
        np.testing.assert_allclose(
            np.asarray(preds_u)[kept], preds[kept], atol=1e-5
        )
        assert not np.asarray(preds_u)[~valid_u].any()


class TestDetectLocateSharded:
    def test_full_serve_datapath_matches_host(self, mesh):
        """detect → jittable locate → classify as one sharded program
        (parallel.make_detect_locate_sharded): every located point matches
        the HOST Multilaterate3D fed the same event stream, and matches
        ground truth within 2 cm (reference serve datapath
        multilateration.py:428-575)."""
        from onset_fingerprinting_tpu.core.coords import (
            polar_to_cartesian,
            speed_of_sound,
        )
        from onset_fingerprinting_tpu.locate import Multilaterate3D
        from onset_fingerprinting_tpu.models.cnn import CNN
        from onset_fingerprinting_tpu.parallel import (
            make_detect_locate_sharded,
        )
        from onset_fingerprinting_tpu.parallel.sharding import (
            events_from_dense,
        )

        sr = 96000
        diameter = 14 * 2.54
        radius = diameter / 2
        sensor_polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
        c = speed_of_sound(100, medium="drumhead")
        sensors_xy = [
            polar_to_cartesian(r * radius, phi)
            for (r, phi, _) in sensor_polar
        ]
        locator = Multilaterate3D(
            sensor_locations=sensor_polar, drum_diameter=diameter,
            medium="drumhead", sr=sr,
        )

        S, T = 8, 128 * 90
        rng = np.random.default_rng(3)
        streams = rng.normal(0, 1e-4, (S, T, 3)).astype(np.float32)
        tt = np.arange(600)
        burst = (
            np.sin(2 * np.pi * 4000 / sr * tt) * np.exp(-tt / 150) * 0.6
        ).astype(np.float32)
        truths = []
        for s in range(S):
            for k, base in enumerate((3000, 7500)):
                r = (0.2 + 0.5 * ((s + k) % 4) / 4) * radius
                x, y = polar_to_cartesian(r, 45.0 * s + 120.0 * k)
                for ch, (sx, sy) in enumerate(sensors_xy):
                    d = int(round(np.hypot(x - sx, y - sy) / c * sr))
                    streams[s, base + d : base + d + 600, ch] += burst
                truths.append((s, float(x), float(y)))

        cfg = DetectorConfig(
            n_channels=3, block_size=128, hipass_freq=0.0, sr=sr,
            backtrack=True,
        )
        static, params, state = detector_init(cfg)
        model = CNN(output_size=2, layer_sizes=(4,))
        mp = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 128), jnp.float32),
            train=False,
        )
        run = make_detect_locate_sharded(
            static, params, state, (S, T, 3), mesh, locator,
            model=model, event_capacity=16, window=128, pre=32,
        )
        points, onsets, emits, preds = run(jnp.asarray(streams), mp)
        points = np.asarray(points)
        emits = np.asarray(emits)
        preds = np.asarray(preds)

        # host-oracle parity per stream: same detector events through the
        # host locator must emit the same points in the same order
        for s in range(S):
            _, (on, deltas, _) = detect_offline(
                static, params, state, jnp.asarray(streams[s])
            )
            chans, onss = events_from_dense(
                np.asarray(on), np.asarray(deltas), cfg.block_size
            )
            locator.ongoing = []
            host_pts = []
            for onset, ch in sorted(zip(onss, chans)):
                res = locator.locate(int(ch), int(onset))
                if res is not None:
                    host_pts.append(res)
            dev_pts = points[s][emits[s]]
            assert len(dev_pts) == len(host_pts), s
            for dp, hp in zip(dev_pts, host_pts):
                assert np.hypot(dp[0] - hp[0], dp[1] - hp[1]) < 0.1, s

        # ground truth: most strikes located within 2 cm
        errs = []
        for s, x, y in truths:
            if emits[s].any():
                p = points[s][emits[s]]
                errs.append(np.hypot(p[:, 0] - x, p[:, 1] - y).min())
        assert len(errs) >= len(truths) * 3 // 4
        assert np.median(errs) < 2.0
        # classify stage: finite predictions exactly on located slots
        assert np.isfinite(preds[emits]).all()
        assert not preds[~emits].any()
