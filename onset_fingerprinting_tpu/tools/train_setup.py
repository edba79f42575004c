"""Calibration CLI: labeled POSD session → trained FCNN serve setup.

Completes the command-line loop around the reference's notebook workflow
(refresh.org trains the location model interactively, then persists it
with ``config.save_setup``, reference realtime/config.py:63-84):

    tools.mine_hits   recordings → POSD sessions (detect/group/align)
    tools.modify_hits[(_mc)]     hand-correct labels
    tools.train_setup            THIS: session → FCNN → setup dir
    realtime.main                serve the setup

Reads a POSD session whose hits carry per-channel ``onset_start`` lists
and ``location`` labels, builds sample-lag feature rows, trains the
lags→(x, y) FCNN (calibration.train_location_model, reference
calibration.py:685-754) and writes a serve-setup directory
(``ml_conf.json`` + orbax model checkpoint) for ``realtime.main``.

The ``--model-input`` flag selects the lag representation and is recorded
in the setup so the serve engine feeds the model the SAME representation
it was trained on (see locate.make_locate_update):

- ``arrival`` (default, reference serve parity): sorted-onset pair lags.
- ``by_channel``: fixed-channel-order ``np.diff``-style lags — the
  reference's own training convention, unambiguous across the full head.

Run:
    python -m onset_fingerprinting_tpu.tools.train_setup session.json \
        --out setup_dir --sensors 0.9,0 0.9,120 0.9,240 \
        [--model-input by_channel] [--location-format polar|xy_cm]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from onset_fingerprinting_tpu.core import posd


def session_lags_and_targets(
    session: dict,
    model_input: str = "arrival",
    location_format: str = "polar",
    radius_cm: float = 17.78,
) -> tuple[np.ndarray, np.ndarray]:
    """Hits → (sample-lag rows [N, 2], target positions [N, 2] meters).

    Hits missing any channel onset (−1 sentinel) or the ``location`` label
    are skipped.  ``location_format="polar"`` reads the POSD spec
    convention (``[r01, phi_deg]``, dataset_spec_draft.org:157-175) scaled
    by ``radius_cm``; ``"xy_cm"`` reads cartesian centimeters (what
    ``data.synth`` sessions store).
    """
    hits = [h for h in session["hits"] if h.get("location") is not None]
    onsets = posd.onsets_array(hits)
    if onsets.ndim != 2 or onsets.shape[1] != 3:
        raise ValueError(
            "need per-channel onset_start lists for exactly 3 channels "
            f"(got shape {onsets.shape}); the serve-loop model bypass "
            "completes groups of 3"
        )
    locs = posd.locations_array(hits)
    keep = (onsets >= 0).all(axis=1)
    onsets, locs = onsets[keep], locs[keep]
    if model_input == "arrival":
        # sorted-onset PAIR lags (second−first, third−first): what the
        # engine's default bypass feeds the model
        onsets = np.sort(onsets, axis=1)
        lags = (onsets[:, 1:] - onsets[:, :1]).astype(np.float32)
    elif model_input == "by_channel":
        # fixed-channel-order ADJACENT diffs = np.diff — the reference's
        # training convention (calibration.py:347)
        lags = np.diff(onsets, axis=1).astype(np.float32)
    else:
        raise ValueError(f"unknown model_input {model_input!r}")
    if location_format == "polar":
        r = locs[:, 0] * radius_cm
        phi = np.radians(locs[:, 1])
        xy_cm = np.stack([r * np.cos(phi), r * np.sin(phi)], axis=1)
    elif location_format == "xy_cm":
        xy_cm = locs[:, :2]
    else:
        raise ValueError(f"unknown location_format {location_format!r}")
    return lags, (xy_cm / 100.0).astype(np.float32)  # FCNN targets: meters


def train_setup(
    json_path: str | Path,
    out_dir: str | Path,
    sensors: list,
    *,
    model_input: str = "arrival",
    location_format: str = "polar",
    radius_cm: float = 17.78,
    medium: str = "air",
    c: float | None = None,
    hidden_layers: tuple = (10, 10, 10),
    lr: float = 1e-2,
    epochs: int = 2500,
    epochs_per_step: int = 50,
) -> float:
    """Train and persist the setup; returns the training L1 error in cm."""
    from onset_fingerprinting_tpu.locate.calibration import (
        train_location_model,
    )
    from onset_fingerprinting_tpu.realtime.setup_io import save_setup

    session = posd.read_json(json_path)
    lags, targets = session_lags_and_targets(
        session, model_input, location_format, radius_cm
    )
    if len(lags) < 8:
        raise ValueError(f"only {len(lags)} usable labeled hits")
    bundle, _ = train_location_model(
        lags, targets, lr=lr, num_epochs=epochs, patience=epochs,
        epochs_per_step=epochs_per_step,
        hidden_layers=tuple(hidden_layers),
    )
    err_cm = 100 * float(
        np.abs(np.asarray(bundle(lags)) - targets).sum(axis=1).mean()
    )
    margs = {"output_size": 2, "hidden_layers": list(hidden_layers),
             "batch_norm": True}
    save_setup(
        sensors, medium, c, bundle, margs, out_dir,
        model_input=model_input,
        # persist the head size: the serve locator's lag-legality maps
        # must match the geometry the targets were scaled to
        drum_diameter=2 * radius_cm,
    )
    return err_cm


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("session_json")
    ap.add_argument("--out", default="setup", help="setup directory")
    ap.add_argument(
        "--sensors", nargs=3, required=True, metavar="R,PHI[,Z]",
        help="three sensor positions, spherical (r fraction, phi deg[, z])",
    )
    ap.add_argument("--model-input", choices=["arrival", "by_channel"],
                    default="arrival")
    ap.add_argument("--location-format", choices=["polar", "xy_cm"],
                    default="polar")
    ap.add_argument("--radius-cm", type=float, default=17.78)
    ap.add_argument("--medium", default="air")
    ap.add_argument("--c", type=float, default=None,
                    help="speed of sound override (m/s)")
    ap.add_argument("--hidden", type=int, nargs="+", default=[10, 10, 10])
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--epochs", type=int, default=2500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sensors = []
    for s in args.sensors:
        v = [float(x) for x in s.split(",")]
        sensors.append(v + [0.0] * (3 - len(v)))
    err_cm = train_setup(
        args.session_json, args.out, sensors,
        model_input=args.model_input,
        location_format=args.location_format,
        radius_cm=args.radius_cm, medium=args.medium, c=args.c,
        hidden_layers=tuple(args.hidden), lr=args.lr, epochs=args.epochs,
    )
    print(
        f"setup written to {args.out}/ (train L1 {err_cm:.3f} cm, "
        f"model_input={args.model_input})"
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
