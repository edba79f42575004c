"""Load reference modules LIVE for parity testing.

Machinery shared by the ``test_reference_*_parity`` modules: copy a
reference source file to a scratch dir, compile its C dependency there
(the reference loads ``envelope_follower.so`` from next to its own file,
and the checkout is read-only), satisfy its unused/external imports with
stubs, and load it standalone via importlib — no reference code enters
this repository; the reference runs as an external golden oracle.

Stubs provided:

- ``librosa`` — only the spectral-detection path touches it; stubbed
  empty so the module imports.
- ``loopmate.circular_array.CircularArray`` — satisfied by OUR host
  ``core.ring_buffer.CircularArray`` (API-parity by construction:
  reference detection.py:719-721 uses ``write`` / ``[-N:]`` / ``.N``).
- a synthetic ``onset_fingerprinting`` parent package exposing the
  already-loaded ``detection`` module, for reference modules that do
  ``from onset_fingerprinting import detection``.
"""

from __future__ import annotations

import importlib.util
import shutil
import subprocess
import sys
import types
from pathlib import Path

REF_PKG = Path("/root/reference/onset_fingerprinting")


def reference_available() -> bool:
    return (
        (REF_PKG / "detection.py").exists()
        and (shutil.which("gcc") or shutil.which("cc")) is not None
    )


def skip_reason() -> str:
    if not (REF_PKG / "detection.py").exists():
        return "reference checkout not available"
    return "no C compiler available"


def _compile_envelope_follower(workdir: Path) -> None:
    cc = shutil.which("gcc") or shutil.which("cc")
    shutil.copy(
        REF_PKG / "envelope_follower.c", workdir / "envelope_follower.c"
    )
    # -O2 -ffp-contract=off: IEEE f32 op-for-op semantics (no fast-math,
    # no FMA contraction) so parity tests compare algorithms, not
    # compiler scheduling
    subprocess.run(
        [cc, "-shared", "-fPIC", "-O2", "-ffp-contract=off",
         "-o", str(workdir / "envelope_follower.so"),
         str(workdir / "envelope_follower.c"), "-lm"],
        check=True,
        capture_output=True,
    )


def _exec_with_modules(spec, mod, extra_modules: dict):
    """Execute ``mod`` (created from ``spec``) with ``extra_modules``
    visible in sys.modules during the import only.  The module stays
    registered under its own (unique ``_ref_*``) name afterwards:
    dataclasses resolves string annotations via
    ``sys.modules[cls.__module__]`` lazily, at class creation and later."""
    saved = {k: sys.modules.get(k) for k in extra_modules}
    sys.modules.update(extra_modules)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _load_standalone(name: str, path: Path, extra_modules: dict):
    """Import ``path`` as module ``name`` with ``extra_modules`` visible in
    sys.modules during the import only."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    return _exec_with_modules(spec, mod, extra_modules)


def _dep_stubs() -> dict:
    from onset_fingerprinting_tpu.core.ring_buffer import CircularArray

    stubs: dict = {}
    if "librosa" not in sys.modules:
        stubs["librosa"] = types.ModuleType("librosa")
    lm = types.ModuleType("loopmate")
    lmca = types.ModuleType("loopmate.circular_array")
    lmca.CircularArray = CircularArray
    lm.circular_array = lmca
    stubs["loopmate"] = lm
    stubs["loopmate.circular_array"] = lmca
    return stubs


def load_detection(workdir: Path):
    """Reference ``detection.py`` with its C library compiled alongside."""
    shutil.copy(REF_PKG / "detection.py", workdir / "detection.py")
    _compile_envelope_follower(workdir)
    return _load_standalone(
        "_ref_detection", workdir / "detection.py", _dep_stubs()
    )


def load_model(workdir: Path):
    """Reference ``model.py`` (torch models; Lightning wrappers stubbed).

    ``lightning`` is absent from the image — stubbed with a bare
    ``LightningModule`` base class, which is all the class *definitions*
    need; the torch ``CCCNN``/``CNN``/``RNN`` cores are fully functional.
    ``onset_fingerprinting.plots`` is only touched inside Lightning
    ``test_step`` methods and is stubbed empty.
    """
    shutil.copy(REF_PKG / "model.py", workdir / "model.py")
    extra = _dep_stubs()
    if "lightning" not in sys.modules:
        import torch

        lightning = types.ModuleType("lightning")

        # the real LightningModule IS an nn.Module subclass; deriving the
        # stub from it keeps state_dict()/eval()/forward dispatch working
        class LightningModule(torch.nn.Module):
            def log(self, *a, **k):  # Lightning logging no-op
                pass

        lightning.LightningModule = LightningModule
        extra["lightning"] = lightning
    pkg = types.ModuleType("onset_fingerprinting")
    pkg.plots = types.ModuleType("onset_fingerprinting.plots")
    extra["onset_fingerprinting"] = pkg
    extra["onset_fingerprinting.plots"] = pkg.plots
    return _load_standalone("_ref_model", workdir / "model.py", extra)


def load_data(workdir: Path):
    """Reference ``data.py`` (frame extractors, datasets).

    Module-level code instantiates ``audiomentations`` transforms, so the
    stub's attribute lookup hands back a no-op transform factory; librosa/
    soundfile are only touched inside feature/IO helpers and stub empty.
    """
    shutil.copy(REF_PKG / "data.py", workdir / "data.py")
    extra = _dep_stubs()

    class _NoopTransform:
        def __init__(self, *a, **k):
            pass

        def __call__(self, samples, sample_rate=None):
            return samples

    class _AudiomentationsStub(types.ModuleType):
        def __getattr__(self, name):
            return _NoopTransform

    for name in ("audiomentations", "soundfile"):
        if name not in sys.modules:
            extra[name] = (
                _AudiomentationsStub(name)
                if name == "audiomentations"
                else types.ModuleType(name)
            )
    return _load_standalone("_ref_data", workdir / "data.py", extra)


def load_utils(workdir: Path):
    """Reference ``utils.py`` (pure numpy/scipy/sklearn; no stubs needed
    beyond the standard set)."""
    shutil.copy(REF_PKG / "utils.py", workdir / "utils.py")
    return _load_standalone("_ref_utils", workdir / "utils.py", _dep_stubs())


def load_calibration(workdir: Path):
    """Reference ``calibration.py`` (torch + scipy; self-importing).

    The module does ``from onset_fingerprinting import calibration,
    multilateration`` — including ITSELF — so the module object is
    registered under that name before executing its body (the standard
    circular-import mechanic, done by hand for a standalone load).
    """
    ml = load_multilateration(workdir)
    shutil.copy(REF_PKG / "calibration.py", workdir / "calibration.py")
    spec = importlib.util.spec_from_file_location(
        "_ref_calibration", workdir / "calibration.py"
    )
    # the module object must exist BEFORE exec so the synthetic parent
    # package can hand it back for the self-import
    mod = importlib.util.module_from_spec(spec)
    pkg = types.ModuleType("onset_fingerprinting")
    pkg.multilateration = ml
    pkg.calibration = mod
    extra = _dep_stubs()
    extra["onset_fingerprinting"] = pkg
    extra["onset_fingerprinting.multilateration"] = ml
    extra["onset_fingerprinting.calibration"] = mod
    return _exec_with_modules(spec, mod, extra)


def load_rt_config(workdir: Path):
    """Reference ``realtime/config.py`` (setup save/load I/O).

    Imports ``FCNN, nn`` from the reference's own calibration module, so
    that loads first (which pulls in multilateration + detection + the
    compiled C kernel — the full oracle stack)."""
    cal = load_calibration(workdir)
    shutil.copy(REF_PKG / "realtime" / "config.py", workdir / "rt_config.py")
    pkg = types.ModuleType("onset_fingerprinting")
    pkg.calibration = cal
    extra = _dep_stubs()
    extra["onset_fingerprinting"] = pkg
    extra["onset_fingerprinting.calibration"] = cal
    return _load_standalone("_ref_rt_config", workdir / "rt_config.py", extra)


def load_multilateration(workdir: Path):
    """Reference ``multilateration.py`` (pulls in detection.py too)."""
    det = load_detection(workdir)
    shutil.copy(
        REF_PKG / "multilateration.py", workdir / "multilateration.py"
    )
    pkg = types.ModuleType("onset_fingerprinting")
    pkg.detection = det
    extra = _dep_stubs()
    extra["onset_fingerprinting"] = pkg
    extra["onset_fingerprinting.detection"] = det
    return _load_standalone(
        "_ref_multilateration", workdir / "multilateration.py", extra
    )
