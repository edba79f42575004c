"""Serve-setup persistence: sensor geometry + location model checkpointing.

Equivalent of the reference's ``save_setup``/``load_setup``
(reference: realtime/config.py:63-108), which persist sensor locations,
medium, speed of sound and FCNN weights as JSON + ``torch.save``.  Here the
model side uses orbax checkpoints of the flax FCNN variables (SURVEY §5.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from onset_fingerprinting_tpu.models.fcnn import FCNNBundle


def read_conf(
    path: str | Path, json_name: str = "ml_conf.json", c: Optional[float] = None
) -> dict:
    """Parse a setup's ``ml_conf.json`` (shared by the orbax and the
    reference-``model.pt`` load paths so the conf contract cannot drift).

    :param c: optional speed-of-sound override (reference parity)."""
    conf = json.loads((Path(path) / json_name).read_text())
    conf["sensor_locations"] = np.asarray(conf["sensor_locations"])
    if c is not None:
        conf["c"] = c
    return conf


def save_setup(
    sensor_locations,
    medium: str,
    c: Optional[float],
    model: Optional[FCNNBundle],
    model_args: Optional[dict],
    path: str | Path,
    json_name: str = "ml_conf.json",
    model_input: str = "arrival",
    drum_diameter: Optional[float] = None,
    feasibility_tols: Optional[tuple] = None,
) -> None:
    """``model_input`` records which lag representation the model was
    trained on ("arrival" pair lags — reference parity — or fixed-order
    "by_channel" np.diff lags; see locate.make_locate_update) so the
    serve app rebuilds the matching locator.  ``drum_diameter`` (cm)
    records the head size the model's targets were scaled to; the serve
    locator's lag-legality maps are built from it."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if isinstance(sensor_locations, np.ndarray):
        sensor_locations = sensor_locations.tolist()
    conf = {
        "sensor_locations": sensor_locations,
        "medium": medium,
        "c": c,
        "model_args": model_args,
    }
    if model_input != "arrival":
        conf["model_input"] = model_input
    if drum_diameter is not None:
        conf["drum_diameter"] = drum_diameter
    if feasibility_tols is not None:
        # locator completion-feasibility cascade (cm tiers) — see
        # locate.multilaterate._LagMapsMixin._feasible_cell
        conf["feasibility_tols"] = [float(t) for t in feasibility_tols]
    (path / json_name).write_text(json.dumps(conf, indent=2))
    if model is not None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            (path / "model_ckpt").resolve(),
            jax.tree.map(np.asarray, model.variables),
            force=True,
        )
        ckptr.wait_until_finished()


def load_setup(
    path: str | Path, json_name: str = "ml_conf.json", c: Optional[float] = None
):
    """Returns (conf dict, FCNNBundle or None).

    Reads setups saved by :func:`save_setup` (orbax ``model_ckpt``) AND,
    transparently, setup directories saved by the reference package
    (``ml_conf.json`` + torch ``model.pt``, reference realtime/config.py:
    63-84) — so a reference user's calibrated serve setup works here
    without retraining (see ``models.torch_import``).
    """
    path = Path(path)
    if not (path / "model_ckpt").exists() and (path / "model.pt").exists():
        from onset_fingerprinting_tpu.models.torch_import import (
            load_reference_setup,
        )

        return load_reference_setup(path, json_name=json_name, c=c)
    conf = read_conf(path, json_name=json_name, c=c)
    model = None
    if conf.get("model_args"):
        if not (path / "model_ckpt").exists():
            # reachable when NEITHER checkpoint format exists (model.pt
            # alone delegates above): silently returning model=None would
            # degrade the serve app to Newton trilateration with no
            # indication the calibrated model was dropped
            raise FileNotFoundError(
                f"setup {path} has model_args but neither model_ckpt/ "
                "(this framework) nor model.pt (reference) exists"
            )
        import orbax.checkpoint as ocp

        import jax.numpy as jnp

        # shared constructor: validates/normalizes activation and rejects
        # typo'd keys at load time (torch-free despite the module name)
        from onset_fingerprinting_tpu.models.torch_import import (
            fcnn_from_model_args,
        )

        args = dict(conf["model_args"])
        input_size = args.get(
            "input_size", len(conf["sensor_locations"]) - 1
        )
        fcnn = fcnn_from_model_args(args)
        dummy = jnp.zeros((1, input_size), jnp.float32)
        target = fcnn.init(jax.random.PRNGKey(0), dummy, train=False)
        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(
            (path / "model_ckpt").resolve(), target=jax.tree.map(np.asarray, target)
        )
        model = FCNNBundle(fcnn, variables)
    return conf, model
