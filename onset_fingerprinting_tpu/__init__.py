"""onset_fingerprinting_tpu — TPU-native onset detection, localization and
fingerprinting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
timlod/onset-fingerprinting (reference mounted at /root/reference):

- ``core``     — functional ring buffers, coordinate transforms, config tree,
                 POSD dataset I/O.
- ``ops``      — streaming compute kernels: attack/release envelopes, EMA
                 min/max trackers, IIR filters, streaming cross-correlation,
                 onset-anchored STFT/mel/MFCC.  lax.scan reference
                 implementations plus Pallas TPU kernels.
- ``detect``   — multi-channel amplitude (time-domain) and spectral onset
                 detectors, onset grouping, cross-correlation lag refinement.
- ``locate``   — lag maps, differentiable trilateration (Gauss-Newton),
                 online multilateration, sensor-geometry calibration.
- ``models``   — FCNN/CNN/RNN/CNNRNN/CCCNN model families (flax.linen),
                 optax training loops, native HPO.
- ``data``     — POSD/MCPOSD datasets, frame extraction, jax-native audio
                 augmentations, WAV I/O.
- ``realtime`` — fused per-block detect→locate→classify engine, actions
                 system, online analysis (STFT/onset-strength/tempogram/
                 quantization), native C++ host runtime bindings.
- ``parallel`` — jax.sharding meshes, data-parallel and halo time-sharded
                 offline processing, distributed training helpers.
- ``utils``    — evaluation metrics and the plotting library.
"""

__version__ = "0.1.0"
