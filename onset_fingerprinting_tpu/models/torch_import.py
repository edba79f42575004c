"""Import reference torch checkpoints into the flax models.

The reference persists its serve setup as ``ml_conf.json`` plus a torch
``model.pt`` state_dict (reference: realtime/config.py:63-108, FCNN at
calibration.py:463-560).  A user switching to this framework should not
have to retrain a calibrated location model just to change runtimes, so
this module converts those checkpoints directly:

- :func:`fcnn_variables_from_state_dict` maps a reference-FCNN
  ``state_dict`` (``network.<i>.weight``/``bias`` Linear entries,
  ``running_mean``/``running_var`` BatchNorm1d entries) onto the flax
  :class:`~onset_fingerprinting_tpu.models.fcnn.FCNN` variable tree
  (``Dense_k.kernel`` is the transposed Linear weight; batch-norm running
  stats land in ``batch_stats``).
- :func:`load_reference_setup` reads a reference setup directory as-is
  and returns the same ``(conf, FCNNBundle)`` shape as
  :func:`onset_fingerprinting_tpu.realtime.setup_io.load_setup` — which
  also calls this automatically when it finds ``model.pt`` instead of an
  orbax checkpoint, so the serve app runs unmodified on reference setups.

torch is imported lazily (CPU-only use); everything else in the package
stays torch-free.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Optional

import numpy as np

from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS, FCNN, FCNNBundle

__all__ = [
    "fcnn_from_model_args",
    "fcnn_variables_from_state_dict",
    "load_reference_setup",
]


def fcnn_from_model_args(model_args: Mapping) -> FCNN:
    """Build the flax FCNN matching a reference ``model_args`` dict.

    The reference's JSON stores the torch constructor kwargs
    (realtime/config.py:74-82) with ``activation`` as a lowercase string
    (its own loader turns that into an nn.Module class at
    config.py:96-105; here the string is the native representation).
    ``input_size`` is dropped — flax infers it at init time.
    """
    args = dict(model_args)
    args.pop("input_size", None)
    act = args.pop("activation", "relu")
    if not isinstance(act, str):  # torch class slipped in; use its name
        act = getattr(act, "__name__", str(act))
    act = act.lower()
    if act not in ACTIVATIONS:
        raise ValueError(
            f"unsupported activation {act!r} in model_args; "
            f"known: {sorted(ACTIVATIONS)}"
        )
    if "hidden_layers" in args:
        args["hidden_layers"] = tuple(args["hidden_layers"])
    # forward the rest verbatim: FCNN's fields are named 1:1 after the
    # reference ctor kwargs (calibration.py:465-475), and a typo'd key
    # must raise (the reference's FCNN(**model_args) would, too)
    return FCNN(activation=act, **args)


def fcnn_variables_from_state_dict(
    state_dict: Mapping[str, "np.ndarray"], model: FCNN
) -> dict:
    """Convert a reference-FCNN torch ``state_dict`` to flax variables.

    The reference lays the net out as one ``nn.Sequential`` named
    ``network`` (calibration.py:493-519): per hidden layer a Linear,
    optionally a BatchNorm1d, an activation and optionally a Dropout,
    then a final Linear.  Only Linear/BatchNorm1d carry tensors, so the
    mapping ignores the sequential indices and pairs tensors up in
    order of appearance:

    - i-th Linear ``weight``/``bias`` → ``params/Dense_i/{kernel,bias}``
      (kernel transposed: torch stores ``[out, in]``, flax ``[in, out]``),
    - i-th BatchNorm1d ``weight``/``bias`` →
      ``params/BatchNorm_i/{scale,bias}`` and
      ``running_mean``/``running_var`` →
      ``batch_stats/BatchNorm_i/{mean,var}`` (``num_batches_tracked`` is
      irrelevant at inference and skipped).

    :param state_dict: torch state_dict (tensors or numpy arrays).
    :param model: the flax FCNN the variables must fit; its
        ``hidden_layers``/``batch_norm`` must describe the same
        architecture the state_dict was trained with.
    :returns: flax variables dict (``{"params": ..., "batch_stats": ...}``).
    :raises ValueError: when the state_dict's layer count or per-layer
        bias presence does not match ``model`` (wrong ``hidden_layers``/
        ``batch_norm``/``bias`` in model_args).
    """

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)(), np.float32)

    # group tensors by their sequential slot, preserving order
    slots: dict[str, dict[str, np.ndarray]] = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        slots.setdefault(".".join(parts[:-1]), {})[parts[-1]] = to_np(tensor)

    params: dict[str, dict] = {}
    batch_stats: dict[str, dict] = {}
    n_dense = n_bn = 0
    for slot in slots.values():
        if "running_mean" in slot:  # BatchNorm1d
            name = f"BatchNorm_{n_bn}"
            params[name] = {
                "scale": slot["weight"],
                "bias": slot["bias"],
            }
            batch_stats[name] = {
                "mean": slot["running_mean"],
                "var": slot["running_var"],
            }
            n_bn += 1
        else:  # Linear
            if ("bias" in slot) != model.bias:
                raise ValueError(
                    f"Linear layer {n_dense} "
                    f"{'has' if 'bias' in slot else 'lacks'} a bias tensor "
                    f"but model_args says bias={model.bias} — a silent "
                    "mismatch here would serve wrong predictions (torch's "
                    "strict load_state_dict raises on the same checkpoint)"
                )
            entry = {"kernel": slot["weight"].T}
            if "bias" in slot:
                entry["bias"] = slot["bias"]
            params[f"Dense_{n_dense}"] = entry
            n_dense += 1

    want_dense = len(model.hidden_layers) + 1
    want_bn = len(model.hidden_layers) if model.batch_norm else 0
    if n_dense != want_dense or n_bn != want_bn:
        raise ValueError(
            f"state_dict has {n_dense} Linear / {n_bn} BatchNorm layers; "
            f"model expects {want_dense} / {want_bn} "
            f"(hidden_layers={tuple(model.hidden_layers)}, "
            f"batch_norm={model.batch_norm})"
        )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def load_reference_setup(
    path: str | Path,
    json_name: str = "ml_conf.json",
    c: Optional[float] = None,
    model_file: str = "model.pt",
):
    """Load a setup directory saved by the REFERENCE package, unchanged.

    Drop-in for the reference's ``load_setup`` (realtime/config.py:87-108)
    returning this framework's ``(conf, FCNNBundle | None)`` — the same
    contract as :func:`realtime.setup_io.load_setup`, which delegates
    here when it sees ``model.pt``.

    :param path: directory holding ``ml_conf.json`` (+ ``model.pt``).
    :param c: optional speed-of-sound override (reference parity).
    :raises FileNotFoundError: when ``model_args`` names a trained model
        but ``model_file`` is missing — silently returning ``model=None``
        would degrade the serve app to Newton trilateration with no
        indication the calibrated model was dropped (the reference's
        ``torch.load`` raises here, too).
    """
    from onset_fingerprinting_tpu.realtime.setup_io import read_conf

    path = Path(path)
    conf = read_conf(path, json_name=json_name, c=c)
    model = None
    model_args = conf.get("model_args")
    if model_args:
        if not (path / model_file).exists():
            raise FileNotFoundError(
                f"{path / model_file} not found but model_args is set — "
                "the setup's calibrated location model is missing (copy "
                "the reference's model.pt next to its ml_conf.json)"
            )
        try:
            import torch
        except ImportError as e:  # pragma: no cover - torch is baked in
            raise ImportError(
                "importing a reference model.pt requires torch "
                "(CPU build is enough)"
            ) from e

        state_dict = torch.load(
            path / model_file, map_location="cpu", weights_only=True
        )
        fcnn = fcnn_from_model_args(model_args)
        variables = fcnn_variables_from_state_dict(state_dict, fcnn)
        model = FCNNBundle(fcnn, variables)
    return conf, model
