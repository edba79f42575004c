"""POSD datasets: classification (POSD) and multichannel location (MCPOSD).

Re-designs of the reference's torch Datasets (reference: data.py:233-559):

- :class:`MCPOSD` — tiny-dataset full-batch location dataset backed by a
  device-resident :class:`FastFrameExtractor`; optional per-epoch random-
  shift re-extraction (n_extractions); ``split``/``from_xy``/``from_file``
  constructors (data.py:233-327).
- :class:`POSD` — recursive session loader for the POSD JSON+WAV format,
  with frame extraction + n_rounds_aug pre-computed augmentation rounds
  (data.py:330-559).  Augmentation runs batched on device
  (``data.augment.some_of`` under vmap) instead of per-example on host.

Both produce plain jnp arrays — feed them straight to ``models.train``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.core import posd as posd_io
from onset_fingerprinting_tpu.data.augment import AUGMENTATIONS, some_of
from onset_fingerprinting_tpu.data.frames import (
    FastFrameExtractor,
    FrameExtractor,
)


class MCPOSD:
    """Multichannel location dataset; ``__getitem__`` returns the full batch
    (the reference trains full-batch with ``batch_size=None``,
    train.py:34-43)."""

    def __init__(
        self,
        data: np.ndarray,
        onsets: np.ndarray,
        sound_positions: np.ndarray,
        frame_length: int = 256,
        pre_samples: int = 0,
        max_shift: int = 0,
        n_extractions: int = 1,
        channels: Optional[Sequence[int]] = None,
    ):
        if channels is not None:
            data = data[:, list(channels)]
        self.data = data
        self._onsets = np.asarray(onsets)
        self._positions = np.asarray(sound_positions)
        self._frame_length = frame_length
        self._pre_samples = pre_samples
        self._max_shift = max_shift
        self.frame_extractor = FastFrameExtractor(
            data, onsets, frame_length, pre_samples, max_shift
        )
        self.n_extractions = n_extractions
        if n_extractions == 1 and max_shift == 0:
            self.y = jnp.asarray(sound_positions, jnp.float32)
            self.x = self.frame_extractor()
            self.straight = True
        else:
            self.y = jnp.asarray(
                np.concatenate([sound_positions] * n_extractions), jnp.float32
            )
            self.straight = False

    def __len__(self) -> int:
        return 1

    def __getitem__(self, index):
        if self.straight:
            return self.x, self.y
        x = jnp.concatenate(
            [self.frame_extractor() for _ in range(self.n_extractions)]
        )
        return x, self.y

    def batch(self):
        return self[0]

    @classmethod
    def from_file(
        cls,
        folder: str | Path,
        name: str,
        frame_length: int = 256,
        pre_samples: int = 0,
        max_shift: int = 0,
        n_extractions: int = 1,
        channels=None,
    ) -> "MCPOSD":
        """Load ``<folder>/<name>.wav`` + ``.json`` (data.py:285-311)."""
        folder = Path(folder)
        from onset_fingerprinting_tpu.core.audio_io import read_wav

        data, _ = read_wav(folder / f"{name}.wav")
        meta = posd_io.read_json(folder / f"{name}.json")
        hits = meta["hits"]
        onsets = posd_io.onsets_array(hits)
        sound_positions = posd_io.locations_array(hits)
        return cls(
            data,
            onsets,
            sound_positions,
            frame_length,
            pre_samples,
            max_shift,
            n_extractions,
            channels=channels,
        )

    @classmethod
    def from_xy(cls, x: jnp.ndarray, y: jnp.ndarray) -> "MCPOSD":
        ds = cls.__new__(cls)
        ds.x = x
        ds.y = y
        ds.straight = True
        ds.n_extractions = 1
        return ds

    def split(self, r: float = 0.8, seed: int = 0):
        """Random WINDOW-level train/val split (data.py:321-327).

        .. warning:: only leakage-safe when each hit contributes exactly
            one window (``n_extractions == 1``, ``max_shift == 0``).
            With shift-augmented multi-extraction datasets, use
            :meth:`split_hits` — a window split puts shifted copies of
            the same hit on both sides and evaluation then measures
            memorization, not generalization.
        """
        n = len(self.y)
        idx = np.random.default_rng(seed).permutation(n)
        cut = int(n * r)
        return (
            self.from_xy(self.x[idx[:cut]], self.y[idx[:cut]]),
            self.from_xy(self.x[idx[cut:]], self.y[idx[cut:]]),
        )

    def split_hits(self, r: float = 0.8, seed: int = 0):
        """HIT-level train/eval split — the leakage-safe one.

        Every extraction round of a hit lands on the same side: the train
        set keeps this dataset's shift/multi-extraction settings over its
        hit subset, while the eval set extracts its held-out hits EXACTLY
        ONCE with no shift (the evaluation contract).  Only available on
        datasets that carry raw audio (not :meth:`from_xy` views).

        :param r: fraction of hits to train on
        :returns: ``(train MCPOSD, eval MCPOSD)`` over disjoint hits
        """
        n = len(self._onsets)
        idx = np.random.default_rng(seed).permutation(n)
        cut = int(n * r)
        tr, ev = np.sort(idx[:cut]), np.sort(idx[cut:])
        train = MCPOSD(
            self.data, self._onsets[tr], self._positions[tr],
            self._frame_length, self._pre_samples, self._max_shift,
            self.n_extractions,
        )
        evald = MCPOSD(
            self.data, self._onsets[ev], self._positions[ev],
            self._frame_length, self._pre_samples, 0, 1,
        )
        return train, evald


class POSD:
    """Percussive onset classification dataset (data.py:330-559).

    Loads every session JSON under ``path`` (files with a ``meta`` key),
    extracts onset frames for the requested channel, and pre-computes
    ``n_rounds_aug`` augmented copies per extractor, batched on device.
    ``labels`` is a pandas DataFrame aligned with ``audio`` rows.
    """

    def __init__(
        self,
        path: str | Path,
        frame_length: int,
        channel: str,
        transform: Optional[Callable] = None,
        pre_samples: int = 0,
        extra_extractors: list = (),
        augmentations: Sequence[Callable] = AUGMENTATIONS,
        n_rounds_aug: int = 5,
        seed: int = 0,
    ):
        import pandas as pd

        path = Path(path)
        session_files = posd_io.find_sessions(path)
        sessions = [posd_io.read_json(f) for f in session_files]
        self.sessions = [s["meta"] for s in sessions]
        self.hit_tables = [posd_io.parse_hits(s["hits"]) for s in sessions]
        assert all(channel in s["channels"] for s in self.sessions)
        self.files = [
            f.with_name(f.stem + f"_{channel}.wav") for f in session_files
        ]
        self.frame_length = frame_length
        self.pre_samples = pre_samples
        # add_pre_samples=True so rows really are frame_length + pre_samples
        # wide (the reference allocates that width but extracts frame_length
        # when pre_samples > 0 — a latent shape defect, data.py:421-427)
        self.frame_extractor = FrameExtractor(
            frame_length, pre_samples, add_pre_samples=True
        )
        self.extra_extractors = [self.frame_extractor] + list(extra_extractors)
        self.augmentations = augmentations
        self.n_rounds_aug = n_rounds_aug
        self._key = jax.random.PRNGKey(seed)
        self._load_audio()
        if transform is not None:
            self.audio = transform(self.audio, self)

    # -- loading -------------------------------------------------------------

    def _aug_batch(self, frames: np.ndarray, sr: int) -> np.ndarray:
        """Augment a batch of frames on device (SomeOf((0,3)) per example)."""
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, len(frames))
        out = jax.vmap(
            lambda k, x: some_of(k, x, sr, self.augmentations)
        )(keys, jnp.asarray(frames, jnp.float32))
        return np.asarray(out)

    def _load_audio(self):
        import pandas as pd
        from onset_fingerprinting_tpu.core.audio_io import read_wav

        n_per_sess = 1 + len(self.extra_extractors) * self.n_rounds_aug
        total = n_per_sess * sum(len(h) for h in self.hit_tables)
        self.audio = np.empty(
            (total, self.frame_length + self.pre_samples), dtype=np.float32
        )
        labels = []
        i = 0
        for file, hits in zip(self.files, self.hit_tables):
            audio, sr = read_wav(file)
            frames = self.frame_extractor(audio, hits["onset_start"].to_numpy())
            self.audio[i : i + len(hits)] = frames
            labels.append(hits)
            i += len(hits)
            for extractor in self.extra_extractors:
                base = extractor(audio, hits["onset_start"].to_numpy())
                for _ in range(self.n_rounds_aug):
                    self.audio[i : i + len(hits)] = self._aug_batch(base, sr)
                    labels.append(hits)
                    i += len(hits)
        self.labels = pd.concat(labels, ignore_index=True)

    # -- constructors ----------------------------------------------------------

    @classmethod
    def from_audio_onsets(
        cls,
        audios: list[np.ndarray],
        onsets: list[Sequence[int]],
        sr: int,
        frame_length: int,
        transform: Optional[Callable] = None,
        pre_samples: int = 0,
        extra_extractors: list = (),
        augmentations: Sequence[Callable] = AUGMENTATIONS,
        n_rounds_aug: int = 5,
        zone_names: Optional[list] = None,
        seed: int = 0,
    ) -> "POSD":
        """In-memory constructor: one audio array + onset list per zone
        (data.py:462-537)."""
        import pandas as pd

        assert len(audios) == len(onsets)
        ds = cls.__new__(cls)
        ds.frame_length = frame_length
        ds.pre_samples = pre_samples
        ds.frame_extractor = FrameExtractor(
            frame_length, pre_samples, add_pre_samples=True
        )
        ds.extra_extractors = [ds.frame_extractor] + list(extra_extractors)
        ds.augmentations = augmentations
        ds.n_rounds_aug = n_rounds_aug
        ds._key = jax.random.PRNGKey(seed)
        if zone_names is None:
            zone_names = list(range(len(audios)))
        n_per_sess = 1 + len(ds.extra_extractors) * ds.n_rounds_aug
        total = n_per_sess * sum(len(o) for o in onsets)
        ds.audio = np.empty(
            (total, frame_length + pre_samples), dtype=np.float32
        )
        labels = []
        i = 0
        for audio, onset, zone in zip(audios, onsets, zone_names):
            onset = np.asarray(onset)
            ds.audio[i : i + len(onset)] = ds.frame_extractor(audio, onset)
            hits = pd.DataFrame({"onset_start": onset, "zone": zone})
            labels.append(hits)
            i += len(onset)
            for extractor in ds.extra_extractors:
                base = extractor(audio, onset)
                for _ in range(ds.n_rounds_aug):
                    ds.audio[i : i + len(onset)] = ds._aug_batch(base, sr)
                    labels.append(hits)
                    i += len(onset)
        if transform is not None:
            ds.audio = transform(ds.audio, ds)
        ds.labels = pd.concat(labels, ignore_index=True)
        return ds

    @classmethod
    def from_subset(cls, audio, labels) -> "POSD":
        ds = cls.__new__(cls)
        ds.audio = audio
        ds.labels = labels
        return ds

    def query(self, query: str) -> "POSD":
        """Label-conditioned sub-dataset (data.py:546-553)."""
        new_labels = self.labels.query(query)
        return POSD.from_subset(
            self.audio[new_labels.index.to_numpy()], new_labels
        )

    def __getitem__(self, index):
        return self.audio[index], self.labels.iloc[index]

    def __len__(self) -> int:
        return self.audio.shape[0]
