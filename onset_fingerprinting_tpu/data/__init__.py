from onset_fingerprinting_tpu.data.frames import (
    FastFrameExtractor,
    FrameExtractor,
    StretchFrameExtractor,
    extract_frames,
)
from onset_fingerprinting_tpu.data.augment import (
    AUGMENTATIONS,
    air_absorption,
    gaussian_noise,
    seven_band_eq,
    some_of,
    tanh_distortion,
)
from onset_fingerprinting_tpu.data.datasets import MCPOSD, POSD
