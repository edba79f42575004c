"""Differentiable TDOA trilateration.

The reference solves the two-equation hyperbolic system

    ‖p - a‖ - ‖p - o‖ = Δa,   ‖p - b‖ - ‖p - o‖ = Δb

with ``scipy.optimize.fsolve`` + a hand-written Jacobian, xtol=0.01,
maxfev=20 (reference: multilateration.py:170-316).  Here the same system is
solved by a damped Newton iteration with the same analytic Jacobian, as a
closed jittable/vmappable program: a fixed-bound ``lax.while_loop`` with a
2×2 direct solve — no host round-trips, batchable over thousands of hits, and
differentiable (for calibration) since every step is jnp.

Convergence semantics follow fsolve loosely: stop when the step infinity-norm
drops below ``xtol`` or after ``max_iter`` iterations; ``success`` requires
the residual to be small and finite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _residual_jac_3d(p, sensors, deltas):
    """Residuals + Jacobian for 3D sensors, unknown point on z=0.

    sensors: [3, 3] rows (origin, a, b); deltas: [2] (Δa, Δb) in distance.
    """
    xy = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
    diff = xy[None, :] - sensors  # [3, 3]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=1))  # [3] (d_o, d_a, d_b)
    f = dist[1:] - dist[0] - deltas
    # d(dist_i)/d(x,y) = diff_i[:2] / dist_i
    grads = diff[:, :2] / dist[:, None]
    jac = grads[1:] - grads[0][None, :]
    return f, jac


def _solve_2x2(jac, f):
    det = jac[0, 0] * jac[1, 1] - jac[0, 1] * jac[1, 0]
    safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    step = (
        jnp.stack(
            [
                jac[1, 1] * f[0] - jac[0, 1] * f[1],
                -jac[1, 0] * f[0] + jac[0, 0] * f[1],
            ]
        )
        / safe
    )
    return step, jnp.abs(det) >= 1e-12


@partial(jax.jit, static_argnames=("max_iter", "unroll"))
def solve_tdoa(
    sensors: jnp.ndarray,
    deltas: jnp.ndarray,
    initial_guess: jnp.ndarray,
    xtol: float = 0.01,
    max_iter: int = 20,
    unroll: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve for the (x, y) strike point. Returns ``(point [2], success)``.

    ``sensors`` is ``[3, 3]`` (origin, a, b) — pass z=0 rows for the 2D case.

    ``unroll=True`` runs ``max_iter`` straight-line masked iterations
    instead of a ``lax.while_loop`` — identical results (once converged the
    masks freeze the carry, and the live path computes the same float ops),
    but compiles to fully-fused code with no per-iteration loop thunks.
    Use it in launch-overhead-bound programs (the per-block serve step);
    the while form does less arithmetic for offline batch solving.
    """
    sensors = sensors.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    p0 = initial_guess.astype(jnp.float32)

    if unroll:
        p = p0
        done = jnp.bool_(False)
        ok = jnp.bool_(True)
        for _ in range(max_iter):
            f, jac = _residual_jac_3d(p, sensors, deltas)
            step, solvable = _solve_2x2(jac, f)
            converged = jnp.max(jnp.abs(step)) < xtol
            live = ~done
            p = jnp.where(live, p - step, p)
            ok = jnp.where(live, ok & solvable, ok)
            done = done | (live & (converged | ~solvable))
    else:

        def cond(carry):
            p, i, done, ok = carry
            return (~done) & (i < max_iter)

        def body(carry):
            p, i, done, ok = carry
            f, jac = _residual_jac_3d(p, sensors, deltas)
            step, solvable = _solve_2x2(jac, f)
            p_new = p - step
            converged = jnp.max(jnp.abs(step)) < xtol
            return p_new, i + 1, converged | ~solvable, ok & solvable

        p, n_it, done, ok = jax.lax.while_loop(
            cond, body, (p0, jnp.int32(0), jnp.bool_(False), jnp.bool_(True))
        )
    f, _ = _residual_jac_3d(p, sensors, deltas)
    success = (
        ok
        & done
        & jnp.all(jnp.isfinite(p))
        & (jnp.max(jnp.abs(f)) < 10 * xtol * (1 + jnp.max(jnp.abs(deltas))))
    )
    return p, success


def solve_trilateration(
    sensor_a, sensor_b, sensor_origin, delta_d_a, delta_d_b, initial_guess
):
    """2D host API matching multilateration.py:170-227: returns the (x, y)
    tuple or None on failure."""
    sensors = jnp.array(
        [
            [*sensor_origin, 0.0],
            [*sensor_a, 0.0],
            [*sensor_b, 0.0],
        ],
        dtype=jnp.float32,
    )
    p, ok = solve_tdoa(
        sensors,
        jnp.array([delta_d_a, delta_d_b]),
        jnp.asarray(initial_guess, dtype=jnp.float32),
    )
    return tuple(map(float, p)) if bool(ok) else None


def solve_trilateration_3d(
    sensor_a, sensor_b, sensor_origin, delta_d_a, delta_d_b, initial_guess
):
    """3D host API matching multilateration.py:230-316 (strike constrained to
    z=0)."""
    sensors = jnp.array(
        [sensor_origin, sensor_a, sensor_b], dtype=jnp.float32
    )
    p, ok = solve_tdoa(
        sensors,
        jnp.array([delta_d_a, delta_d_b]),
        jnp.asarray(initial_guess, dtype=jnp.float32),
    )
    return tuple(map(float, p)) if bool(ok) else None


@partial(jax.jit, static_argnames=("max_iter",))
def trilaterate_batch(
    sensors: jnp.ndarray,
    deltas: jnp.ndarray,
    initial_guesses: jnp.ndarray,
    xtol: float = 0.01,
    max_iter: int = 20,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched solve: ``sensors [H, 3, 3]``, ``deltas [H, 2]``, guesses
    ``[H, 2]`` → (points [H, 2], success [H]).  One fused device program for
    thousands of hits — the offline/locator hot path."""
    return jax.vmap(
        lambda s, d, g: solve_tdoa(s, d, g, xtol=xtol, max_iter=max_iter)
    )(sensors, deltas, initial_guesses)
