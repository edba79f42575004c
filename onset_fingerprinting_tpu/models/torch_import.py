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
    "cccnn_from_model_args",
    "cccnn_variables_from_state_dict",
    "cnn_from_model_args",
    "cnn_variables_from_state_dict",
    "cnnrnn_from_model_args",
    "cnnrnn_variables_from_state_dict",
    "fcnn_from_model_args",
    "fcnn_variables_from_state_dict",
    "load_reference_setup",
    "rnn_from_model_args",
    "rnn_variables_from_state_dict",
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


def cnn_from_model_args(model_args: Mapping):
    """Build the flax CNN matching a reference ``model_args`` dict
    (reference CNN ctor, model.py:58-75).  Training-only kwargs (``loss``,
    ``lr``) and ``input_size``/``channels`` (shape-inferred at init) are
    dropped."""
    from onset_fingerprinting_tpu.models.cnn import CNN

    args = dict(model_args)
    for k in ("input_size", "channels", "loss", "lr"):
        args.pop(k, None)
    act = args.pop("activation", "silu")
    if not isinstance(act, str):
        act = getattr(act, "__name__", str(act))
    act = act.lower()
    if act not in ACTIVATIONS:
        raise ValueError(
            f"unsupported activation {act!r} in model_args; "
            f"known: {sorted(ACTIVATIONS)}"
        )
    if "layer_sizes" in args:
        args["layer_sizes"] = tuple(args["layer_sizes"])
    return CNN(activation=act, **args)


def cnn_variables_from_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    model,
    input_size: int,
    channels: int,
) -> dict:
    """Convert a reference-CNN torch ``state_dict`` to flax variables.

    Reference layout (model.py:85-113): ``conv_layers.conv{i}`` Conv1d,
    optional ``conv_layers.bn{i}`` BatchNorm1d, and the flat ``fc`` head.
    Conv kernels transpose ``[out, in/groups, k]`` → ``[k, in/groups,
    out]``; BatchNorm running stats land in ``batch_stats``.  The flat
    head needs a LAYOUT PERMUTATION: torch flattens the final feature
    maps channel-major (``[C_last, V_last]``) while the flax model
    flattens the NWC activations position-major (``[V_last, C_last]``) —
    so the fc weight is reshaped ``[out, C, V]`` → ``[out, V, C]`` before
    transposing, which is why this converter needs ``input_size`` and
    ``channels`` (to recompute ``V_last`` through the conv arithmetic).

    :raises ValueError: on depth/width/bn mismatches, unrecognized keys,
        or an fc shape that does not factor as ``C_last * V_last``.
    """

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)(), np.float32)

    convs: dict[int, dict[str, np.ndarray]] = {}
    bns: dict[int, dict[str, np.ndarray]] = {}
    fc: dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        arr = to_np(tensor)
        if parts[0] == "fc":
            fc[parts[-1]] = arr
        elif parts[0] == "conv_layers" and parts[1].startswith("conv"):
            convs.setdefault(int(parts[1][4:]), {})[parts[-1]] = arr
        elif parts[0] == "conv_layers" and parts[1].startswith("bn"):
            bns.setdefault(int(parts[1][2:]), {})[parts[-1]] = arr
        else:
            raise ValueError(f"unrecognized state_dict key {key!r}")

    n_layers = len(model.layer_sizes)
    want_bn = n_layers if model.batch_norm else 0
    if len(convs) != n_layers or len(bns) != want_bn or not fc:
        raise ValueError(
            f"state_dict has {len(convs)} conv / {len(bns)} norm layers "
            f"and {'a' if fc else 'no'} fc head; model expects "
            f"{n_layers} / {want_bn} "
            f"(layer_sizes={tuple(model.layer_sizes)}, "
            f"batch_norm={model.batch_norm})"
        )

    params: dict[str, dict] = {}
    batch_stats: dict[str, dict] = {}
    v = input_size
    for i in sorted(convs):
        slot = convs[i]
        if model.layer_sizes[i - 1] != slot["weight"].shape[0]:
            raise ValueError(
                f"conv{i} has {slot['weight'].shape[0]} output features; "
                f"model_args layer_sizes says {model.layer_sizes[i - 1]}"
            )
        params[f"Conv_{i - 1}"] = {
            "kernel": slot["weight"].transpose(2, 1, 0),
            "bias": slot["bias"],
        }
        k = slot["weight"].shape[-1]
        v = v + 2 * model.padding - model.dilation * (k - 1)
        if model.pool:
            v //= 2
    for i in sorted(bns):
        params[f"BatchNorm_{i - 1}"] = {
            "scale": bns[i]["weight"],
            "bias": bns[i]["bias"],
        }
        batch_stats[f"BatchNorm_{i - 1}"] = {
            "mean": bns[i]["running_mean"],
            "var": bns[i]["running_var"],
        }

    c_last = model.layer_sizes[-1]
    w = fc["weight"]
    if w.shape[1] != c_last * v:
        raise ValueError(
            f"fc expects {w.shape[1]} inputs but the conv arithmetic gives "
            f"C_last*V_last = {c_last}*{v} — wrong input_size/padding/"
            "pool in model_args?"
        )
    # torch flattens [C, V]; the flax model flattens [V, C]
    w = w.reshape(-1, c_last, v).transpose(0, 2, 1).reshape(-1, c_last * v)
    params["Dense_0"] = {"kernel": w.T, "bias": fc["bias"]}
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def cccnn_from_model_args(model_args: Mapping):
    """Build the flax CCCNN matching a reference ``model_args`` dict.

    Field names are 1:1 with the reference's CCCNN constructor
    (model.py:445-459) except ``input_size`` (flax infers it) and
    ``activation`` (a lowercase string here, a torch class there).
    """
    from onset_fingerprinting_tpu.models.cccnn import CCCNN

    args = dict(model_args)
    args.pop("input_size", None)
    act = args.pop("activation", "silu")
    if not isinstance(act, str):
        act = getattr(act, "__name__", str(act))
    act = act.lower()
    if act not in ACTIVATIONS:
        raise ValueError(
            f"unsupported activation {act!r} in model_args; "
            f"known: {sorted(ACTIVATIONS)}"
        )
    for key in ("layer_sizes", "kernel_sizes", "strides"):
        if key in args and not isinstance(args[key], int):
            args[key] = tuple(args[key])
    return CCCNN(activation=act, **args)


def cccnn_variables_from_state_dict(
    state_dict: Mapping[str, "np.ndarray"], model
) -> dict:
    """Convert a reference-CCCNN torch ``state_dict`` to flax variables.

    Accepts both a bare ``CCCNN.state_dict()`` and an ``LCCCNN``
    (Lightning wrapper, model.py:542-629) state_dict — the latter's
    ``model.`` key prefix is stripped.  Reference layout (model.py:475-513):
    ``conv_layers.conv{i}`` Conv1d tensors (optionally
    ``conv_layers.bn{i}`` GroupNorm(1, ·)) and the ``fc`` Linear head.
    Mapping:

    - ``conv_layers.conv{i}.weight [out, in, k]`` →
      ``params/_ConvStack_0/Conv_{i-1}/kernel [k, in, out]``;
      ``bias`` verbatim,
    - ``conv_layers.bn{i}.{weight,bias}`` →
      ``params/_ConvStack_0/GroupNorm_{i-1}/{scale,bias}``,
    - ``fc.{weight,bias}`` → ``params/Dense_0/{kernel.T,bias}`` — valid
      because the per-channel SELF-correlation is an even function of
      lag, so the reference's grouped-conv lag ordering and our
      FFT/DFT ordering feed the head identical vectors.

    ``group=True`` checkpoints convert with the SAME tensor mapping: the
    flax group path is the reference's own grouped formulation (grouped
    convs via ``feature_group_count`` with torch's channel-major output
    order, plus ONE GroupNorm spanning all C·K features jointly,
    model.py:487-502), so torch's grouped ``weight [C*K_out, K_in, k]``
    transposes to the grouped ``nn.Conv`` kernel ``[k, K_in, C*K_out]``
    verbatim and the joint norm's scale/bias carry over unchanged.

    :param model: the flax CCCNN the variables must fit (same
        ``layer_sizes``/``batch_norm``/``group`` the checkpoint was
        trained with; ``cc_norm`` must be False — the redesigned head has
        a different fc shape by construction).
    :raises ValueError: on layer-count/shape mismatches.
    """
    if getattr(model, "cc_norm", False):
        raise ValueError(
            "cc_norm=True changes the dense-head input layout; reference "
            "checkpoints only fit cc_norm=False models"
        )

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)(), np.float32)

    convs: dict[int, dict[str, np.ndarray]] = {}
    norms: dict[int, dict[str, np.ndarray]] = {}
    fc: dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":  # LCCCNN wrapper prefix
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        arr = to_np(tensor)
        if parts[0] == "fc":
            fc[parts[-1]] = arr
        elif parts[0] == "conv_layers" and parts[1].startswith("conv"):
            convs.setdefault(int(parts[1][4:]), {})[parts[-1]] = arr
        elif parts[0] == "conv_layers" and parts[1].startswith("bn"):
            norms.setdefault(int(parts[1][2:]), {})[parts[-1]] = arr
        else:
            raise ValueError(f"unrecognized state_dict key {key!r}")

    n_layers = len(model.layer_sizes)
    want_norms = n_layers if model.batch_norm else 0
    if len(convs) != n_layers or len(norms) != want_norms or not fc:
        raise ValueError(
            f"state_dict has {len(convs)} conv / {len(norms)} norm layers "
            f"and {'a' if fc else 'no'} fc head; model expects "
            f"{n_layers} / {want_norms} "
            f"(layer_sizes={tuple(model.layer_sizes)}, "
            f"batch_norm={model.batch_norm})"
        )

    # grouped checkpoints carry channels-times-wider conv tensors
    # (out = layer_size * channels, model.py:488-494)
    g = model.channels if getattr(model, "group", False) else 1
    stack: dict[str, dict] = {}
    for i in sorted(convs):
        slot = convs[i]
        # torch Conv1d [out, in/groups, k] → flax nn.Conv [k, in/groups,
        # out]; identical for grouped convs (both order output features
        # channel-major)
        stack[f"Conv_{i - 1}"] = {
            "kernel": slot["weight"].transpose(2, 1, 0),
            "bias": slot["bias"],
        }
        if model.layer_sizes[i - 1] * g != slot["weight"].shape[0]:
            raise ValueError(
                f"conv{i} has {slot['weight'].shape[0]} output features; "
                f"model_args layer_sizes says {model.layer_sizes[i - 1]}"
                + (f" x {g} grouped channels" if g > 1 else "")
            )
    for i in sorted(norms):
        stack[f"GroupNorm_{i - 1}"] = {
            "scale": norms[i]["weight"],
            "bias": norms[i]["bias"],
        }
    params = {
        "_ConvStack_0": stack,
        "Dense_0": {"kernel": fc["weight"].T, "bias": fc["bias"]},
    }
    return {"params": params}


def rnn_from_model_args(model_args: Mapping):
    """Build the flax RNN matching a reference ``model_args`` dict
    (reference RNN ctor, model.py:169-188).  ``batch_first=False`` has no
    flax-side equivalent layout and is rejected; ``bias``/``activation``
    are dropped (bias handled at weight-conversion time, activation unused
    in the reference's forward)."""
    from onset_fingerprinting_tpu.models.rnn import RNN

    args = dict(model_args)
    for k in ("input_size", "channels", "loss", "lr", "bias", "activation"):
        args.pop(k, None)
    if not args.pop("batch_first", True):
        raise ValueError("batch_first=False checkpoints are not supported")
    return RNN(**args)


_GRU_GATES = ("r", "z", "n")
_LSTM_GATES = ("i", "f", "g", "o")


def _split_gates(w: "np.ndarray", n: int) -> list:
    """Split torch's fused gate matrix/vector ``[n*H, ...]`` into n gates."""
    h = w.shape[0] // n
    return [w[g * h : (g + 1) * h] for g in range(n)]


def _cell_params(
    rnn_type: str,
    w_ih: "np.ndarray",
    w_hh: "np.ndarray",
    b_ih: Optional["np.ndarray"],
    b_hh: Optional["np.ndarray"],
) -> dict:
    """One torch recurrent layer → one flax cell's param dict.

    torch computes every gate as ``W_ih x + b_ih + W_hh h + b_hh``; the
    flax cells carry ONE bias per gate (two for the GRU candidate gate,
    whose h-side bias sits inside the reset product, exactly like torch),
    so the two torch biases are summed where flax has a single slot.
    ``bias=False`` checkpoints convert exactly via zero biases.
    """
    h = w_hh.shape[1]
    if b_ih is None:
        b_ih = np.zeros(w_ih.shape[0], np.float32)
    if b_hh is None:
        b_hh = np.zeros(w_hh.shape[0], np.float32)
    if rnn_type == "GRU":
        wi = _split_gates(w_ih, 3)
        wh = _split_gates(w_hh, 3)
        bi = _split_gates(b_ih, 3)
        bh = _split_gates(b_hh, 3)
        return {
            "ir": {"kernel": wi[0].T, "bias": bi[0] + bh[0]},
            "iz": {"kernel": wi[1].T, "bias": bi[1] + bh[1]},
            "in": {"kernel": wi[2].T, "bias": bi[2]},
            "hr": {"kernel": wh[0].T},
            "hz": {"kernel": wh[1].T},
            "hn": {"kernel": wh[2].T, "bias": bh[2]},
        }
    if rnn_type == "LSTM":
        wi = _split_gates(w_ih, 4)
        wh = _split_gates(w_hh, 4)
        bi = _split_gates(b_ih, 4)
        bh = _split_gates(b_hh, 4)
        out = {}
        for g, gate in enumerate(_LSTM_GATES):
            out[f"i{gate}"] = {"kernel": wi[g].T}
            out[f"h{gate}"] = {"kernel": wh[g].T, "bias": bi[g] + bh[g]}
        return out
    # plain tanh RNN
    assert h == w_ih.shape[0]
    return {
        "i": {"kernel": w_ih.T, "bias": b_ih + b_hh},
        "h": {"kernel": w_hh.T},
    }


_CELL_NAMES = {"GRU": "GRUCell", "LSTM": "OptimizedLSTMCell", "RNN": "SimpleCell"}


def _attention_params(sd: dict, heads: int) -> dict:
    """torch ``nn.MultiheadAttention`` tensors (fused ``in_proj_weight``
    ``[3E, E]`` stacking q/k/v) → flax ``MultiHeadDotProductAttention``
    params (per-projection ``[E, heads, head_dim]``, torch's head-major
    feature ordering).  Pops the ``attention.*`` keys from ``sd``."""
    in_w = sd.pop("attention.in_proj_weight")
    in_b = sd.pop("attention.in_proj_bias")
    e = in_w.shape[1]
    hd = e // heads
    attn = {}
    for i, name in enumerate(("query", "key", "value")):
        attn[name] = {
            "kernel": in_w[i * e : (i + 1) * e].T.reshape(e, heads, hd),
            "bias": in_b[i * e : (i + 1) * e].reshape(heads, hd),
        }
    attn["out"] = {
        "kernel": sd.pop("attention.out_proj.weight").T.reshape(heads, hd, e),
        "bias": sd.pop("attention.out_proj.bias"),
    }
    return attn


def rnn_variables_from_state_dict(
    state_dict: Mapping[str, "np.ndarray"], model
) -> dict:
    """Convert a reference-RNN torch ``state_dict`` to flax variables.

    Reference layout (model.py:216-238): a fused multi-layer
    ``nn.GRU/LSTM/RNN`` (``rnn.weight_ih_l{k}[_reverse]`` …), a
    ``layer_norm``, a ``MultiheadAttention`` (fused ``in_proj_weight``
    holding the stacked q/k/v projections) and the ``fc`` head.  Gate
    blocks split per flax cell (see :func:`_cell_params`); attention
    projections reshape ``[E, E]`` → ``[E, heads, head_dim]`` with
    torch's head-major feature ordering.

    The flax RNN's LayerNorm runs at torch-parity eps=1e-5 (models/rnn.py
    sets it explicitly; flax's default 1e-6 would shift activations ~1e-3
    on short windows), so converted checkpoints evaluate without a
    normalization offset.
    """

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)(), np.float32)

    sd = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        sd[".".join(parts)] = to_np(tensor)

    cell_name = _CELL_NAMES[model.rnn_type]
    params: dict = {}
    n_cells = 0
    for layer in range(model.num_layers):
        for suffix in ("", "_reverse") if model.bidirectional else ("",):
            w_ih = sd.pop(f"rnn.weight_ih_l{layer}{suffix}", None)
            if w_ih is None:
                raise ValueError(
                    f"state_dict lacks rnn layer {layer}{suffix or ''} — "
                    f"model expects num_layers={model.num_layers}, "
                    f"bidirectional={model.bidirectional}"
                )
            params[f"{cell_name}_{n_cells}"] = _cell_params(
                model.rnn_type,
                w_ih,
                sd.pop(f"rnn.weight_hh_l{layer}{suffix}"),
                sd.pop(f"rnn.bias_ih_l{layer}{suffix}", None),
                sd.pop(f"rnn.bias_hh_l{layer}{suffix}", None),
            )
            n_cells += 1
    if any(k.startswith("rnn.") for k in sd):
        extra = [k for k in sd if k.startswith("rnn.")]
        raise ValueError(
            f"unconsumed rnn tensors {extra} — model_args num_layers/"
            "bidirectional disagree with the checkpoint"
        )

    params["LayerNorm_0"] = {
        "scale": sd.pop("layer_norm.weight"),
        "bias": sd.pop("layer_norm.bias"),
    }

    params["MultiHeadDotProductAttention_0"] = _attention_params(
        sd, model.num_heads
    )

    params["Dense_0"] = {
        "kernel": sd.pop("fc.weight").T,
        "bias": sd.pop("fc.bias"),
    }
    if sd:
        raise ValueError(f"unrecognized state_dict keys {sorted(sd)}")
    return {"params": params}


def cnnrnn_from_model_args(model_args: Mapping):
    """Build the flax CNNRNN matching a reference ``model_args`` dict
    (reference CNNRNN ctor, model.py:311-329)."""
    from onset_fingerprinting_tpu.models.rnn import CNNRNN

    args = dict(model_args)
    for k in ("input_size", "channels", "loss", "lr"):
        args.pop(k, None)
    act = args.pop("activation", "silu")
    if not isinstance(act, str):
        act = getattr(act, "__name__", str(act))
    act = act.lower()
    if act not in ACTIVATIONS:
        raise ValueError(
            f"unsupported activation {act!r} in model_args; "
            f"known: {sorted(ACTIVATIONS)}"
        )
    if "layer_sizes" in args:
        args["layer_sizes"] = tuple(args["layer_sizes"])
    return CNNRNN(activation=act, **args)


def cnnrnn_variables_from_state_dict(
    state_dict: Mapping[str, "np.ndarray"], model
) -> dict:
    """Convert a reference-CNNRNN torch ``state_dict`` to flax variables.

    Conv/BatchNorm mapping as in :func:`cnn_variables_from_state_dict`
    (no fc flatten permutation — the conv output feeds the GRU as a
    ``[B, K, V]`` sequence unflattened, model.py:391-396); GRU layers via
    :func:`_cell_params`; attention via :func:`_attention_params`.
    """

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)(), np.float32)

    sd = {}
    convs: dict[int, dict[str, np.ndarray]] = {}
    bns: dict[int, dict[str, np.ndarray]] = {}
    for key, tensor in state_dict.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if parts[-1] == "num_batches_tracked":
            continue
        arr = to_np(tensor)
        if parts[0] == "conv_layers" and parts[1].startswith("conv"):
            convs.setdefault(int(parts[1][4:]), {})[parts[-1]] = arr
        elif parts[0] == "conv_layers" and parts[1].startswith("bn"):
            bns.setdefault(int(parts[1][2:]), {})[parts[-1]] = arr
        else:
            sd[".".join(parts)] = arr

    n_layers = len(model.layer_sizes)
    want_bn = n_layers if model.batch_norm else 0
    if len(convs) != n_layers or len(bns) != want_bn:
        raise ValueError(
            f"state_dict has {len(convs)} conv / {len(bns)} norm layers; "
            f"model expects {n_layers} / {want_bn}"
        )

    params: dict = {}
    batch_stats: dict = {}
    for i in sorted(convs):
        params[f"Conv_{i - 1}"] = {
            "kernel": convs[i]["weight"].transpose(2, 1, 0),
            "bias": convs[i]["bias"],
        }
    for i in sorted(bns):
        params[f"BatchNorm_{i - 1}"] = {
            "scale": bns[i]["weight"],
            "bias": bns[i]["bias"],
        }
        batch_stats[f"BatchNorm_{i - 1}"] = {
            "mean": bns[i]["running_mean"],
            "var": bns[i]["running_var"],
        }

    for layer in range(model.n_rnn_layers):
        w_ih = sd.pop(f"rnn.weight_ih_l{layer}", None)
        if w_ih is None:
            raise ValueError(
                f"state_dict lacks rnn layer {layer} — model expects "
                f"n_rnn_layers={model.n_rnn_layers}"
            )
        params[f"GRUCell_{layer}"] = _cell_params(
            "GRU",
            w_ih,
            sd.pop(f"rnn.weight_hh_l{layer}"),
            sd.pop(f"rnn.bias_ih_l{layer}", None),
            sd.pop(f"rnn.bias_hh_l{layer}", None),
        )
    if any(k.startswith("rnn.") for k in sd):
        raise ValueError(
            "unconsumed rnn tensors — model n_rnn_layers disagrees with "
            "the checkpoint"
        )
    params["MultiHeadDotProductAttention_0"] = _attention_params(
        sd, model.num_heads
    )
    params["Dense_0"] = {
        "kernel": sd.pop("fc.weight").T,
        "bias": sd.pop("fc.bias"),
    }
    if sd:
        raise ValueError(f"unrecognized state_dict keys {sorted(sd)}")
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
