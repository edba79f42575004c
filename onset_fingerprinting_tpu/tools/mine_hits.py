"""Dataset mining CLI: recordings → detected, grouped, aligned POSD hits.

Automates the reference's notebook mining flow (SURVEY §3.2,
notebooks/mining_mc_hits.org): run the fused amplitude detector over each
multichannel WAV, cluster per-hit onset groups, CC-align onsets across
channels (``fix_onsets``), and write POSD session JSONs ready for the label
editors (tools.modify_hits*) and datasets (data.MCPOSD/POSD).

Run:
    python -m onset_fingerprinting_tpu.tools.mine_hits <wav...> \
        [--out DIR] [--min-channels 3] [--max-distance 1000] [--fix] \
        [--backend pallas]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from onset_fingerprinting_tpu.core import posd
from onset_fingerprinting_tpu.core.audio_io import read_wav
from onset_fingerprinting_tpu.detect import (
    detect_onsets_amplitude,
    find_onset_groups,
    fix_onsets,
)


def mine_file(
    wav: str | Path,
    out_dir: str | Path,
    min_channels: Optional[int] = None,
    max_distance: int = 1000,
    fix: bool = False,
    backend: str = "scan",
    on_threshold: float = 0.5,
    off_threshold: float = 0.1,
    hipass_freq: float = 2000.0,
    sr_override: Optional[int] = None,
) -> Optional[Path]:
    """Mine one recording; returns the written session json (or None if no
    groups were found)."""
    wav = Path(wav)
    audio, sr = read_wav(wav)
    if sr_override:
        sr = sr_override
    if audio.ndim == 1:
        audio = audio[:, None]
    channels, onsets, _ = detect_onsets_amplitude(
        audio,
        sr=sr,
        hipass_freq=hipass_freq,
        on_threshold=on_threshold,
        off_threshold=off_threshold,
        backend=backend,
    )
    groups = find_onset_groups(
        onsets, channels, max_distance=max_distance,
        min_channels=min_channels or audio.shape[1],
    )
    if groups is None:
        print(f"{wav.name}: {len(onsets)} onsets, no qualifying groups")
        return None
    if fix:
        groups = fix_onsets(
            audio.astype(np.float64), groups, take_abs=True, d=1
        )
    hits = posd.make_hits(groups)
    jp = posd.save_session(
        Path(out_dir), wav.stem, audio, sr, hits,
        meta={"source": str(wav)},
    )
    print(
        f"{wav.name}: {len(onsets)} onsets → {len(groups)} hits → {jp.name}"
    )
    return jp


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--out", default="mined", help="output directory")
    ap.add_argument("--min-channels", type=int, default=None)
    ap.add_argument("--max-distance", type=int, default=1000)
    ap.add_argument("--fix", action="store_true",
                    help="CC-align onsets across channels")
    ap.add_argument("--backend", choices=["scan", "pallas"], default="scan")
    ap.add_argument("--on-threshold", type=float, default=0.5)
    ap.add_argument("--off-threshold", type=float, default=0.1)
    ap.add_argument("--hipass", type=float, default=2000.0)
    ap.add_argument("--sr", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    written = 0
    for wav in args.wavs:
        if mine_file(
            wav, args.out, args.min_channels, args.max_distance, args.fix,
            args.backend, args.on_threshold, args.off_threshold,
            args.hipass, args.sr,
        ):
            written += 1
    print(f"wrote {written} sessions to {args.out}/")
    return 0 if written else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
