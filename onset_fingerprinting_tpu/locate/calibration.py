"""Sensor-geometry calibration from TDOA observations.

Re-design of the reference's calibration stack (reference:
onset_fingerprinting/calibration.py:13-754).  The reference hand-writes
Jacobians for scipy TNC and runs a torch Adam loop; here every loss is a
small jnp function and gradients come from ``jax.grad``:

- :func:`tdoa_calib_loss` / :func:`tdoa_calib_loss_with_sp` — jitted losses
  over all hits at once (the reference loops per hit).
- :func:`fit_tnc` — scipy TNC driver fed by jax value-and-grad (keeps the
  reference's bounded quasi-Newton behavior for parity).
- :func:`optimize_C`, :func:`calibrate` — the reference's multi-stage
  pipelines: fit → median-error outlier filter → (scalar C search) → refit.
- :func:`optimize_positions` — optax Adam with per-group learning rates,
  cosine schedule, grad clipping and patience early-stop (torch twin:
  calibration.py:563-682).
- :func:`train_location_model` — fits the FCNN (models.fcnn) on lags → (x,y).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import optimize as sciopt

from onset_fingerprinting_tpu.core.coords import spherical_to_cartesian


def calibration_locations(
    n_lugs: int,
    n_each,
    radius: float,
    add_z: Optional[int] = None,
    clockwise: bool = False,
) -> list[tuple]:
    """Spherical coordinates of calibration hits around the drum's lugs
    (calibration.py:423-460)."""
    n = len(n_each) if isinstance(n_each, list) else 1
    angles = np.repeat(range(0, 360, int(360 / n_lugs)), n_each)
    if not clockwise:
        angles = 360 - angles
    radii = np.repeat(np.repeat([radius] * n, n_each), n_lugs)
    if add_z is not None:
        assert isinstance(add_z, int), "add_z must be an integer"
        zs = np.repeat(np.repeat([add_z] * n, n_each), n_lugs)
        return list(zip(radii, angles, zs))
    return list(zip(radii, angles))


def _lug_sound_positions(
    radius: float, n_lugs: int, n_each: int, center_hits: int
) -> jnp.ndarray:
    """Center hits + lug-ring hits in cartesian, as one [H, 3] array."""
    ring = [
        spherical_to_cartesian(*pos)
        for pos in calibration_locations(n_lugs, n_each, radius, 0)
    ]
    ring = jnp.stack([jnp.stack(p) for p in ring]) if ring else jnp.zeros((0, 3))
    center = jnp.zeros((center_hits, 3))
    return jnp.concatenate([center, ring]).astype(jnp.float32)


def _per_hit_errors(sensor_positions, sound_positions, observed_tdoa, C, norm):
    """[H, S-1] per-hit TDOA residual errors (vectorized over hits)."""
    dists = (
        jnp.linalg.norm(
            sound_positions[:, None, :] - sensor_positions[None, :, :], axis=-1
        )
        / C
    )
    tdoa = jnp.diff(dists, axis=1)
    return jnp.abs(tdoa - observed_tdoa) ** norm


@partial(jax.jit, static_argnames=("norm",))
def tdoa_calib_loss(
    params: jnp.ndarray,
    sound_positions: jnp.ndarray,
    observed_tdoa: jnp.ndarray,
    C: float = 343.0,
    norm: int = 1,
) -> jnp.ndarray:
    """Mean summed per-hit TDOA error; params = flat sensor positions
    (calibration.py:13-45).  Scalar, differentiable."""
    sp = params.reshape(-1, 3)
    e = _per_hit_errors(sp, sound_positions, observed_tdoa, C, norm)
    return jnp.mean(jnp.sum(e, axis=0))


def tdoa_calib_errors(params, sound_positions, observed_tdoa, C=343.0, norm=1):
    """Per-hit error vector [H] (for outlier filtering,
    calibration.py:286-289)."""
    sp = jnp.asarray(params).reshape(-1, 3)
    e = _per_hit_errors(
        sp, jnp.asarray(sound_positions), jnp.asarray(observed_tdoa), C, norm
    )
    return np.asarray(jnp.sum(e, axis=1))


def tdoa_calib_loss_with_sp(
    params: jnp.ndarray,
    observed_tdoa: jnp.ndarray,
    n_lugs: int = 10,
    n_each: int = 4,
    center_hits: int = 4,
    norm: int = 1,
    opt_c: bool = False,
    C: float = 343.0,
) -> jnp.ndarray:
    """Joint loss over hit-ring radius (params[0]), optionally C (params[1]),
    and sensor positions (calibration.py:91-139).  Differentiable in all of
    them — the lug layout is regenerated from the radius each evaluation.
    """
    radius = params[0]
    angles = np.repeat(
        360.0 - np.repeat(np.arange(0, 360, 360 // n_lugs), n_each), 1
    ).astype(np.float32)
    phi = jnp.asarray(angles)
    # elevation 0 ⇒ inclination 90°: on-surface ring
    x = radius * jnp.cos(jnp.radians(phi))
    y = radius * jnp.sin(jnp.radians(phi))
    ring = jnp.stack([x, y, jnp.zeros_like(x)], axis=1)
    sound_positions = jnp.concatenate(
        [jnp.zeros((center_hits, 3)), ring]
    )
    c_val = params[1] if opt_c else C
    sp = params[(1 + int(opt_c)):].reshape(-1, 3)
    e = _per_hit_errors(sp, sound_positions, observed_tdoa, c_val, norm)
    return jnp.mean(jnp.sum(e, axis=0))


def fit_tnc(
    loss_fn: Callable,
    x0: np.ndarray,
    args: tuple = (),
    bounds=None,
    maxfun: int = 10000,
) -> sciopt.OptimizeResult:
    """Bounded TNC minimization with jax-provided value-and-grad — the
    reference's optimizer (method='TNC', hand Jacobians) with autodiff.

    Runs in float64 (scoped ``jax.enable_x64``): quasi-Newton line searches
    stall on fp32 gradient noise well before the reference's convergence
    criteria (calibration.py:574,593-595 target 1e-9…1e-12 improvements).
    """
    with jax.enable_x64():
        vag = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, *args)))

        def f(p):
            v, g = vag(jnp.asarray(p, jnp.float64))
            return float(v), np.asarray(g, dtype=np.float64)

        return sciopt.minimize(
            f, np.asarray(x0, np.float64), jac=True, method="TNC",
            bounds=bounds, options={"maxfun": maxfun},
        )


def optimize_C(
    tdoa: np.ndarray,
    n_lugs: int = 10,
    n_each: int = 4,
    center_hits: int = 4,
    norm: int = 1,
    C_range: tuple = (336, 345),
    initial_C: float = 343.0,
    radius: float = 14 * 2.54 / 100 / 2,
    hits_at: float = 0.155,
    filter_errors_above: float = 3,
    sound_positions=None,
    initial_sensor_positions=None,
    bounds=None,
    **kwargs,
):
    """3-stage pipeline: TNC position fit at initial C → median-error outlier
    filter → bounded scalar search over C with nested TNC → final refit
    (calibration.py:212-314).  Returns (positions [S, 3], best C)."""
    if sound_positions is None:
        sound_positions = np.asarray(
            _lug_sound_positions(hits_at, n_lugs, n_each, center_hits)
        )
    if initial_sensor_positions is None:
        initial_sensor_positions = np.array(
            [
                spherical_to_cartesian(*pos)
                for pos in [(0.9, 140, 75), (0.9, 10, 55), (hits_at, 100, 15)]
            ]
        )
    if bounds is None:
        bounds = [(None, None), (None, None), (0, None)] * 2 + [
            (-radius, radius),
            (-radius, radius),
            (0, radius),
        ]
    sound_positions = jnp.asarray(sound_positions)
    tdoa_j = jnp.asarray(tdoa)
    res = fit_tnc(
        tdoa_calib_loss,
        np.asarray(initial_sensor_positions).flatten(),
        args=(sound_positions, tdoa_j, initial_C, norm),
        bounds=bounds,
    )
    x0 = res.x
    errors = tdoa_calib_errors(x0, sound_positions, tdoa_j, initial_C, norm)
    med = np.median(errors)
    good = np.where(errors < filter_errors_above * med)[0]

    sp_g = sound_positions[good]
    td_g = tdoa_j[good]

    def objective(C):
        return fit_tnc(
            tdoa_calib_loss, x0, args=(sp_g, td_g, float(C), norm),
            bounds=bounds, maxfun=1000,
        ).fun

    best = sciopt.minimize_scalar(objective, bounds=C_range, method="bounded")
    final = fit_tnc(
        tdoa_calib_loss, x0, args=(sp_g, td_g, float(best.x), norm),
        bounds=bounds, maxfun=100000,
    )
    return final.x.reshape(-1, 3), float(best.x)


def calibrate(
    onsets: np.ndarray,
    sr: int = 96000,
    C: float = 343.0,
    diameter: float = 14 * 2.54,
    n_lugs: int = 10,
    n_each: int = 4,
    hits_at: float = 0.9,
    center_hits: int = 4,
    norm: int = 1,
    filter_errors_above: float = 2,
    opt_c: bool = False,
) -> np.ndarray:
    """End-to-end sensor calibration from an onset matrix [H, S]
    (calibration.py:317-420): joint radius(+C)+positions TNC fit with bounds
    → outlier filter → refit.  Returns sensor positions [S, 3]."""
    radius = diameter / 2 / 100
    tdoa = jnp.asarray(np.diff(onsets) / sr)
    initial_sensor_positions = np.array(
        [
            spherical_to_cartesian(*pos)
            for pos in [(0.9, 140, 75), (0.9, 10, 55), (radius, 100, 15)]
        ]
    )
    x0 = np.concatenate(
        [
            [radius * hits_at],
            [C] if opt_c else [],
            initial_sensor_positions.flatten(),
        ]
    )
    bounds = (
        [(0.5 * radius, 1.1 * radius)]
        + ([(336.0, 345.0)] if opt_c else [])
        + [(None, None), (None, None), (0, None)] * 2
        + [(-radius, radius), (-radius, radius), (0, radius)]
    )
    res = fit_tnc(
        lambda p, td: tdoa_calib_loss_with_sp(
            p, td, n_lugs, n_each, center_hits, norm, opt_c, C
        ),
        x0,
        args=(tdoa,),
        bounds=bounds,
    )
    r = res.x[0]
    if opt_c:
        C = res.x[1]
    sound_positions = _lug_sound_positions(float(r), n_lugs, n_each, center_hits)
    sensor_positions = res.x[1 + int(opt_c):].reshape(-1, 3)

    errors = tdoa_calib_errors(sensor_positions, sound_positions, tdoa, C, norm)
    med = np.median(errors)
    good = np.where(errors < filter_errors_above * med)[0]

    final = fit_tnc(
        tdoa_calib_loss,
        sensor_positions.flatten(),
        args=(sound_positions[good], tdoa[good], float(C), norm),
        bounds=[(None, None), (None, None), (0, None)] * 2
        + [(-radius, radius), (-radius, radius), (0, radius)],
    )
    return final.x.reshape(-1, 3)


def optimize_positions(
    observed_lags: np.ndarray,
    initial_sensor_positions: np.ndarray,
    initial_sound_positions: np.ndarray,
    lr: float = 0.01,
    lossfun: str = "mse",
    num_epochs: int = 1000,
    C: float = 342.29,
    sr: int = 96000,
    eps: float = 1e-12,
    patience: int = 10,
    verbose: bool = False,
):
    """Joint gradient optimization of sensor positions, sound x/y (z fixed 0)
    and C — the reference's torch Adam loop (calibration.py:563-682) in
    optax: per-parameter-group LRs (2e-3, 1e-4, 0.1 × lr), cosine annealing,
    global-norm clipping, patience early stop on train loss.

    Returns (sensor_positions [S, 3], sound_positions [H, 3], C).
    """
    observed_tdoa = jnp.asarray(observed_lags, jnp.float32) / sr
    params = {
        "sensors": jnp.asarray(initial_sensor_positions, jnp.float32),
        "sounds_xy": jnp.asarray(initial_sound_positions, jnp.float32)[:, :2],
        "C": jnp.asarray(C, jnp.float32),
    }
    lrs = {"sensors": 2e-3 * lr, "sounds_xy": 1e-4 * lr, "C": 0.1 * lr}

    def loss_fn(p):
        sounds = jnp.concatenate(
            [p["sounds_xy"], jnp.zeros((p["sounds_xy"].shape[0], 1))], axis=1
        )
        dists = jnp.linalg.norm(
            sounds[:, None, :] - p["sensors"][None, :, :], axis=-1
        )
        tdoa = (dists[:, :2] - dists[:, 2:]) / p["C"]
        err = tdoa - observed_tdoa
        if lossfun == "mse":
            return jnp.mean(err**2)
        return jnp.mean(jnp.abs(err))

    schedules = {
        k: optax.cosine_decay_schedule(v, num_epochs) for k, v in lrs.items()
    }
    label_fn = lambda p: {k: k for k in p}
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {k: optax.adam(schedules[k]) for k in lrs}, label_fn
        ),
    )
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    last_loss = np.inf
    counter = 0
    for epoch in range(num_epochs):
        params, opt_state, loss = step(params, opt_state)
        loss = float(loss)
        if loss < last_loss - eps:
            last_loss = loss
            counter = 0
        elif counter < patience:
            counter += 1
        else:
            break
        if verbose and epoch % 10 == 0:
            print(f"epoch {epoch}: loss {loss:.3e}")
    sounds = np.concatenate(
        [np.asarray(params["sounds_xy"]), np.zeros((len(observed_tdoa), 1))],
        axis=1,
    )
    return np.asarray(params["sensors"]), sounds, float(params["C"])


def train_location_model(
    observed_lags: np.ndarray,
    sound_positions: np.ndarray,
    lr: float = 0.01,
    lossfun: str = "l1",
    num_epochs: int = 1000,
    eps: float = 1e-9,
    patience: int = 10,
    verbose: bool = False,
    epochs_per_step: int = 1,
    **fcnn_kwargs,
):
    """Train an FCNN mapping lag vectors → (x, y) hit coordinates
    (calibration.py:685-754).  Returns (trained model apply bundle, errors).

    ``epochs_per_step > 1`` scans that many full-batch epochs per device
    dispatch (per-epoch host sync costs ~30 ms over a remote TPU tunnel);
    early stopping and best-state tracking then run at chunk granularity.
    """
    from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle

    from onset_fingerprinting_tpu.models.train import cosine_warm_restarts

    x = jnp.asarray(observed_lags, jnp.float32)
    y = jnp.asarray(sound_positions, jnp.float32)[:, :2]
    model = FCNN(output_size=2, **fcnn_kwargs)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # torch CosineAnnealingLR(T_max=epochs/10) oscillates past T_max — the
    # reference relies on that cycling (calibration.py:723-725); use explicit
    # warm restarts with the same period.
    schedule = cosine_warm_restarts(lr, max(num_epochs // 10, 1))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = tx.init(variables["params"])

    def loss_fn(p, batch_stats):
        out, updates = model.apply(
            {"params": p, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        err = out - y
        loss = (
            jnp.mean(jnp.abs(err)) if lossfun == "l1" else jnp.mean(err**2)
        )
        return loss, updates["batch_stats"]

    @jax.jit
    def step(p, bs, opt_state):
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), bs, opt_state, loss

    p = variables["params"]
    bs = variables.get("batch_stats", {})
    best = (p, bs)
    last_loss = np.inf
    counter = 0
    errors = []

    if epochs_per_step > 1:
        k = epochs_per_step

        @jax.jit
        def step_many(p, bs, opt_state):
            def body(carry, _):
                p, bs, opt_state = carry
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p, bs)
                updates, opt_state = tx.update(grads, opt_state, p)
                return (
                    optax.apply_updates(p, updates), bs, opt_state
                ), loss

            (p, bs, opt_state), losses = jax.lax.scan(
                body, (p, bs, opt_state), None, length=k
            )
            # loss OF the post-chunk params (one extra forward, no update):
            # the per-epoch `losses` are each evaluated at pre-update
            # params, so the chunk minimum describes a mid-chunk state we
            # cannot snapshot — pairing it with the post-chunk params would
            # reintroduce the off-by-one the single-epoch loop guards
            # against (possibly many steps past the optimum, at a
            # warm-restart LR spike).  Best-tracking uses (p, end_loss),
            # an honest pair, at chunk granularity.
            end_loss, bs_eval = loss_fn(p, bs)
            return p, bs, bs_eval, opt_state, losses, end_loss

        for chunk in range((num_epochs + k - 1) // k):
            p, bs, bs_eval, opt_state, losses, end_loss = step_many(
                p, bs, opt_state
            )
            losses = np.asarray(losses)
            errors.extend(float(v) for v in losses)
            end_loss = float(end_loss)
            if end_loss < last_loss - eps:
                last_loss = end_loss
                best = (p, bs_eval)
                counter = 0
            elif counter < patience:
                counter += k
            else:
                break
            if verbose:
                print(f"epoch {(chunk + 1) * k}: loss {end_loss:.3e}")
        return (
            FCNNBundle(model, {"params": best[0], "batch_stats": best[1]}),
            errors,
        )

    for epoch in range(num_epochs):
        # ``loss`` is evaluated at the *pre-update* (p, bs): track the best
        # state with those, not the post-update ones (an off-by-one here
        # returns params one — possibly huge, at a warm-restart LR spike —
        # step past the optimum).
        p_prev, bs_prev = p, bs
        p, bs, opt_state, loss = step(p, bs, opt_state)
        loss = float(loss)
        errors.append(loss)
        if loss < last_loss - eps:
            last_loss = loss
            best = (p_prev, bs)
            counter = 0
        elif counter < patience:
            counter += 1
        else:
            break
        if verbose and epoch % 10 == 0:
            print(f"epoch {epoch}: loss {loss:.3e}")
    return FCNNBundle(model, {"params": best[0], "batch_stats": best[1]}), errors
