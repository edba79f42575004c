"""Frame extraction: gather onset-anchored windows from recordings.

Re-design of the reference's three extractors (reference: data.py:55-223).
The torch ``unfold``/``sliding_window_view`` tricks become a single gather
(``audio[onsets[:, None] + arange(frame)]``) which XLA turns into one dynamic
gather on device — the natural TPU idiom.  Random shifts use jax PRNG keys
(explicit, reproducible).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("frame_length",))
def extract_frames(
    audio: jnp.ndarray, starts: jnp.ndarray, frame_length: int
) -> jnp.ndarray:
    """Gather ``[len(starts), frame_length, ...]`` windows from ``audio``.

    ``audio`` may be [N] or [N, C]; starts are clipped to valid range.
    """
    starts = jnp.clip(starts, 0, audio.shape[0] - frame_length)
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return audio[idx]


class FrameExtractor:
    """Onset-window extractor for possibly-large/streamed files
    (data.py:55-120).

    ``use_min_onset=True`` extracts one shared window per onset group
    (starting at the earliest channel); otherwise per-channel windows.
    """

    def __init__(
        self,
        frame_length: int,
        pre_samples: int,
        max_shift: int = 0,
        add_pre_samples: bool = False,
        use_min_onset: bool = True,
        seed: int = 0,
    ):
        self.frame_length = frame_length + (pre_samples if add_pre_samples else 0)
        self.pre_samples = pre_samples
        self.max_shift = max_shift
        self.use_min_onset = use_min_onset
        self._rng = np.random.default_rng(seed)

    def __call__(self, audio: np.ndarray, onsets: np.ndarray) -> np.ndarray:
        audio = jnp.asarray(audio)
        onsets = np.asarray(onsets)
        offset = self.pre_samples
        if self.max_shift:
            shifts = self._rng.integers(
                -self.max_shift, self.max_shift + 1, len(onsets)
            )
            offset = offset - shifts
        if audio.ndim == 2:
            if self.use_min_onset:
                starts = onsets.min(axis=1) - offset
                f = extract_frames(audio, jnp.asarray(starts), self.frame_length)
                # [O, frame, C] gather → the reference's [O, C, frame]
                # layout (data.py:108-110 sliding_window_view puts the
                # window axis last) — matches the per-channel branch and
                # FastFrameExtractor
                return np.asarray(jnp.swapaxes(f, 1, 2))
            # per-channel windows → [O, C, frame]
            if self.max_shift and np.ndim(offset) == 1:
                offset = offset[:, None]
            starts = onsets - offset
            out = [
                np.asarray(
                    extract_frames(
                        audio[:, c], jnp.asarray(starts[:, c]), self.frame_length
                    )
                )
                for c in range(audio.shape[1])
            ]
            return np.stack(out, axis=1)
        starts = onsets - offset
        return np.asarray(
            extract_frames(audio, jnp.asarray(starts), self.frame_length)
        )


class FastFrameExtractor:
    """Device-resident extractor for small datasets (data.py:123-192):
    audio lives in HBM, each call is one jitted gather (with fresh random
    shifts when ``max_shift > 0``)."""

    def __init__(
        self,
        audio: np.ndarray,
        onsets: np.ndarray,
        frame_length: int,
        pre_samples: int,
        max_shift: int = 0,
        add_pre_samples: bool = False,
        seed: int = 0,
    ):
        self.frame_length = frame_length + (pre_samples if add_pre_samples else 0)
        self.pre_samples = pre_samples
        self.max_shift = max_shift
        onsets = np.asarray(onsets)
        if onsets.ndim == 2:
            onsets = onsets.min(axis=1)
        self.onsets = jnp.asarray(onsets)
        self.audio = jnp.asarray(audio, dtype=jnp.float32)
        self.key = jax.random.PRNGKey(seed)
        if max_shift == 0:
            self.frames = self._gather(self.onsets - pre_samples)

    def _gather(self, starts: jnp.ndarray) -> jnp.ndarray:
        f = extract_frames(self.audio, starts, self.frame_length)
        # [O, frame, C] → [O, C, frame] to match model input layout
        return jnp.swapaxes(f, 1, 2) if f.ndim == 3 else f

    def __call__(self) -> jnp.ndarray:
        if self.max_shift:
            self.key, sub = jax.random.split(self.key)
            shifts = jax.random.randint(
                sub, (len(self.onsets),), -self.max_shift, self.max_shift + 1
            )
            return self._gather(self.onsets - self.pre_samples + shifts)
        return self.frames


class StretchFrameExtractor(FrameExtractor):
    """Random time-stretch augmentation extractor (data.py:195-223): extracts
    a slightly longer/shorter window and resamples it to ``frame_length`` via
    rFFT resampling (scipy.signal.resample equivalent, on device)."""

    def __init__(
        self,
        frame_length: int,
        pre_samples: int,
        max_stretch: float = 0.03,
        use_min_onset: bool = True,
        seed: int = 0,
    ):
        super().__init__(frame_length, pre_samples, seed=seed)
        if not use_min_onset:
            raise NotImplementedError("use_min_onset=False not supported")
        self.max_shift = max(int(self.frame_length * max_stretch), 2)

    @staticmethod
    def _resample_fft(x: np.ndarray, num: int) -> np.ndarray:
        """scipy.signal.resample-style Fourier resampling along axis 0."""
        n = x.shape[0]
        X = np.fft.rfft(x, axis=0)
        out_bins = num // 2 + 1
        Y = np.zeros((out_bins,) + X.shape[1:], dtype=X.dtype)
        m = min(out_bins, X.shape[0])
        Y[:m] = X[:m]
        return np.fft.irfft(Y, num, axis=0) * (num / n)

    def __call__(self, audio: np.ndarray, onsets: np.ndarray) -> np.ndarray:
        onsets = np.asarray(onsets)
        shifts = self._rng.integers(1, self.max_shift, len(onsets))
        shifts *= self._rng.choice((-1, 1), size=len(shifts))
        if audio.ndim == 2:
            group_starts = onsets.min(axis=1) - self.pre_samples
        else:
            group_starts = onsets - self.pre_samples
        out = np.empty(
            onsets.shape + (self.frame_length,), dtype=np.float32
        )
        for i, (onset, shift) in enumerate(zip(group_starts, shifts)):
            seg = audio[onset : onset + self.frame_length + shift]
            out[i] = self._resample_fft(np.asarray(seg), self.frame_length).T
        return out
