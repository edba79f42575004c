"""Calibration parity against the reference run LIVE (C1, C2, C5).

The reference differentiates its TDOA calibration losses with
HAND-WRITTEN jacobians (calibration.py:48-209); ours come from
``jax.grad``.  These tests load the reference's actual ``calibration.py``
(tests/ref_harness) and require, on identical inputs:

- ``calibration_locations`` exact equality (C5),
- ``tdoa_calib_loss``/``tdoa_calib_loss_with_sp`` value parity, and
  ``jax.grad`` equality with the NUMERICAL gradient of the reference's
  own loss (C1/C2).

Documented reference defect found by these tests: the reference's
hand-written ``tdoa_calib_loss_jac`` is a uniformly MIS-SCALED gradient
of its own loss — measured exactly ``C·(S-1)/(n_hits·norm)`` × the
numerical gradient (49× on the norm=1 fixture here: it normalizes by
``len(sound_positions)`` where the loss means over the ``S-1`` lag
axis, calibration.py:86 vs 45, drops a ``1/C`` in the distance
derivative, calibration.py:75, and for norm=2 also drops the exponent
factor 2, calibration.py:65-70).  A constant positive scale preserves
the TNC search direction, which is why the reference's calibration
still converged; ``jax.grad`` of our loss needs no such luck.  The
tests pin the exact relation for both norms so any change in either
side surfaces.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_calibration, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_cal(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    pytest.importorskip("torch")
    return load_calibration(tmp_path_factory.mktemp("refcal"))


@pytest.fixture(scope="module")
def x64():
    """Gradient parity needs f64 (the reference computes in f64; f32
    finite-precision noise swamps ~1e-6 jacobian entries)."""
    import jax

    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def test_calibration_locations_matches(ref_cal):
    from onset_fingerprinting_tpu.locate.calibration import (
        calibration_locations,
    )

    for kwargs in (
        dict(n_lugs=10, n_each=4, radius=0.17),
        dict(n_lugs=8, n_each=3, radius=0.2, add_z=0),
        dict(n_lugs=6, n_each=2, radius=0.15, clockwise=True),
        dict(n_lugs=5, n_each=[2, 1, 3, 2, 2], radius=0.18, add_z=1),
    ):
        ours = calibration_locations(**kwargs)
        ref = ref_cal.calibration_locations(**kwargs)
        assert len(ours) == len(ref)
        np.testing.assert_allclose(
            np.asarray(ours, dtype=float), np.asarray(ref, dtype=float)
        )


def _fixture(seed=0, n_sensors=3, n_hits=14):
    rng = np.random.default_rng(seed)
    sensors = rng.uniform(-0.2, 0.2, (n_sensors, 3))
    sounds = rng.uniform(-0.15, 0.15, (n_hits, 3))
    sounds[:, 2] = 0.0
    dists = np.linalg.norm(
        sounds[:, None, :] - sensors[None, :, :], axis=-1
    ) / 343.0
    tdoa = np.diff(dists, axis=1) + rng.normal(0, 1e-5, (n_hits, n_sensors - 1))
    return sensors.reshape(-1), sounds, tdoa


@pytest.mark.parametrize("norm", [1, 2])
def test_tdoa_calib_loss_and_grad_match(ref_cal, x64, norm):
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.locate.calibration import tdoa_calib_loss

    params, sounds, tdoa = _fixture()
    ref_loss = ref_cal.tdoa_calib_loss(params, sounds, tdoa, norm=norm)
    ours_loss = tdoa_calib_loss(
        jnp.asarray(params), jnp.asarray(sounds), jnp.asarray(tdoa), norm=norm
    )
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-6)

    from scipy.optimize import approx_fprime

    ours_jac = np.asarray(
        jax.grad(
            lambda p: tdoa_calib_loss(
                p, jnp.asarray(sounds), jnp.asarray(tdoa), norm=norm
            )
        )(jnp.asarray(params))
    )
    # ground truth: numerical gradient of the REFERENCE's own loss
    num_jac = approx_fprime(
        params,
        lambda q: ref_cal.tdoa_calib_loss(q, sounds, tdoa, norm=norm),
        1e-9,
    )
    np.testing.assert_allclose(ours_jac, num_jac, rtol=2e-3, atol=1e-10)

    # the reference's hand jac is exactly C*(S-1)/(n_hits*norm) x that
    # gradient (see module docstring) — pin the defect so changes
    # surface.  The extra 1/norm: its weighted_error_term uses
    # sign(e)*|e|^(norm-1) where d|e|^norm/de = norm*sign(e)*|e|^(norm-1)
    # (calibration.py:65-70), exact for norm=1, a dropped factor 2 for
    # norm=2
    scale = 343.0 * (len(params) // 3 - 1) / (len(sounds) * norm)
    ref_jac = np.asarray(
        ref_cal.tdoa_calib_loss_jac(params, sounds, tdoa, norm=norm)
    )
    np.testing.assert_allclose(
        ref_jac, scale * ours_jac, rtol=1e-6, atol=1e-12
    )


@pytest.mark.parametrize("opt_c", [False, True])
def test_tdoa_calib_loss_with_sp_matches(ref_cal, x64, opt_c):
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.locate.calibration import (
        tdoa_calib_loss_with_sp,
    )

    n_lugs, n_each, center_hits = 8, 2, 3
    n_sensors = 3
    rng = np.random.default_rng(1)
    sensors = rng.uniform(-0.2, 0.2, (n_sensors, 3))
    head = [0.171]
    if opt_c:
        head.append(340.0)
    params = np.concatenate([head, sensors.reshape(-1)])
    n_hits = center_hits + n_lugs * n_each
    tdoa = rng.normal(0, 1e-4, (n_hits, n_sensors - 1))
    kwargs = dict(
        n_lugs=n_lugs, n_each=n_each, center_hits=center_hits, opt_c=opt_c
    )

    ref_loss = ref_cal.tdoa_calib_loss_with_sp(params, tdoa, **kwargs)
    ours_loss = tdoa_calib_loss_with_sp(
        jnp.asarray(params), jnp.asarray(tdoa), **kwargs
    )
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-6)

    from scipy.optimize import approx_fprime

    ours_jac = np.asarray(
        jax.grad(
            lambda p: tdoa_calib_loss_with_sp(p, jnp.asarray(tdoa), **kwargs)
        )(jnp.asarray(params))
    )
    num_jac = approx_fprime(
        params,
        lambda q: ref_cal.tdoa_calib_loss_with_sp(q, tdoa, **kwargs),
        1e-9,
    )
    np.testing.assert_allclose(ours_jac, num_jac, rtol=2e-3, atol=1e-8)
