from onset_fingerprinting_tpu.detect.amplitude import (
    AmplitudeOnsetDetector,
    DetectorState,
    detect_block,
    detect_offline,
    detect_offline_chunked,
    detect_onsets_amplitude,
    detector_init,
    warmup_minmax,
)
from onset_fingerprinting_tpu.detect.spectral import (
    detect_onsets_spectral,
    peak_pick,
)
from onset_fingerprinting_tpu.detect.grouping import find_onset_groups
from onset_fingerprinting_tpu.detect.refine import (
    adjust_onset,
    adjust_onset_rel,
    detect_onset_region,
    filter_data,
    fix_onsets,
)


def detect_onsets(x, sr: int = 96000, method: str = "amp", **kwargs):
    """Dispatcher (reference detection.py:12-16)."""
    if method == "amp":
        return detect_onsets_amplitude(x, sr=sr, **kwargs)
    return detect_onsets_spectral(x, sr=sr, **kwargs)
