"""Metrics/tracing and trainer checkpoint tests."""

import time

import numpy as np

from onset_fingerprinting_tpu.utils.metrics import Metrics, TBWriter, trace


class TestMetrics:
    def test_counters_and_latency(self):
        m = Metrics()
        m.count("detections", 5)
        with trace("detect", m):
            time.sleep(0.002)
        s = m.summary()
        assert s["counters"]["detections"] == 5
        assert s["latency"]["detect"]["p50_ms"] >= 1.0
        assert "detections" in m.report()

    def test_tb_writer(self, tmp_path):
        w = TBWriter(tmp_path / "tb")
        w.add_scalar("loss", 0.5, 0)
        w.add_scalar("loss", 0.4, 1)
        w.close()
        assert any((tmp_path / "tb").iterdir())


class TestTrainerCheckpoint:
    def test_save_load_round_trip(self, tmp_path, rng):
        from onset_fingerprinting_tpu.core.config import TrainConfig
        from onset_fingerprinting_tpu.models import CNN, Trainer

        x = rng.normal(size=(16, 2, 32)).astype(np.float32)
        y = rng.normal(size=(16, 2)).astype(np.float32)
        trainer = Trainer(
            CNN(output_size=2, layer_sizes=[4]),
            TrainConfig(lr=1e-3, num_epochs=5, patience=10),
        )
        state = trainer.fit((x, y))
        pred1 = trainer.predict(state, x)
        trainer.save_checkpoint(state, tmp_path / "ckpt")
        state2 = trainer.load_checkpoint(tmp_path / "ckpt", x)
        pred2 = trainer.predict(state2, x)
        np.testing.assert_allclose(pred1, pred2, atol=1e-6)
