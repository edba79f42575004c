from onset_fingerprinting_tpu.utils import plots
from onset_fingerprinting_tpu.utils.eval import (
    butter_highpass,
    butter_highpass_filter,
    clipping_audio,
    drum_frequency,
    knn_metrics,
    wave_speed,
)
