"""Online multilateration: streaming onset events → strike locations.

Re-design of the reference's online locators (reference:
multilateration.py:319-875).  Two layers:

- Host classes :class:`Multilaterate3D` / :class:`Multilaterate` /
  :class:`MultilateratePaired` mirroring the reference's event-at-a-time call
  contract (candidate-group tracking, negative-lag swap repair, optional
  CC-based onset refinement against a live ring buffer, legality via lag
  maps, trilateration or learned-model fallback).  Lag-map legality checks
  and trilateration run jitted on device.

- A fixed-capacity, fully jittable locator core
  (:class:`LocatorState`, :func:`locator_init`, :func:`locate_update`) for
  the fused realtime engine: candidate groups live in padded arrays + masks
  so the whole detect→locate path stays on-device in one program.  The
  reference's dynamic ``ongoing`` Python list (multilateration.py:436-534)
  becomes a masked slot table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import median_filter

from onset_fingerprinting_tpu.core.coords import (
    DIAMETER,
    cartesian_to_polar,
    polar_to_cartesian,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.locate.geometry import lag_map_2d, lag_map_3d
from onset_fingerprinting_tpu.locate.trilateration import (
    solve_tdoa,
    solve_trilateration,
)
from onset_fingerprinting_tpu.ops.xcorr import (
    cross_correlation_lag,
    find_lag,
)
from onset_fingerprinting_tpu.detect.refine import adjust_onset

ONSET_TOL = 50
NORM_CUTOFF = 10
LOOKAROUND = ONSET_TOL + NORM_CUTOFF


def remove_seed(groups, group):
    """Drop competing candidate groups sharing the completed group's seed
    (multilateration.py:160-167)."""
    seed_sensor, seed_onset = group[0][0], group[1][0]
    return [
        g
        for g in groups
        if not (g[0][0] == seed_sensor and g[1][0] == seed_onset)
    ]


class _LagMapsMixin:
    """Shared lag-map precompute + legality checks."""

    def _build_maps(self, map_fn, drum_diameter, sr, c=None):
        n = len(self.sensor_locs)
        self.lag_maps = [dict() for _ in range(n)]
        self.max_lags = [dict() for _ in range(n)]
        self.min_lags = [dict() for _ in range(n)]
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                lm = np.array(
                    map_fn(
                        self.sensor_locs[j],
                        self.sensor_locs[i],
                        d=drum_diameter,
                        sr=sr,
                        scale=1,
                        medium=self.medium,
                        tol=2,  # 2 cm slack around the drum edge
                        c=c,
                    )
                )
                # Slack for slightly-negative lags near the center when
                # sensors are placed circularly (multilateration.py:386-387).
                lm[lm < -self.samples_per_cm * 1] = np.nan
                self.lag_maps[i][j] = lm
                self.max_lags[i][j] = np.nanmax(lm)
                self.min_lags[i][j] = np.nanmin(lm)
        self.max_max_lags = [
            np.nanmax(list(d.values())) for d in self.max_lags
        ]

    def is_legal(self, first_sensor: int, later_sensor: int, lag: float) -> bool:
        """Pairwise lag-feasibility check (multilateration.py:397-411)."""
        return (
            self.min_lags[first_sensor][later_sensor]
            < lag
            < self.max_lags[first_sensor][later_sensor]
        )

    def is_legal_3d(self, group, tolerance: float = 1):
        """Joint 2-lag feasibility; returns the (col-major) grid argmax where
        both lags fit, (0, 0) when infeasible (multilateration.py:413-426)."""
        tolerance *= self.samples_per_cm
        sensors, onsets = group[0], group[1]
        lag1 = onsets[1] - onsets[0]
        lag2 = onsets[2] - onsets[0]
        lm1 = self.lag_maps[sensors[0]][sensors[1]]
        lm2 = self.lag_maps[sensors[0]][sensors[2]]
        with np.errstate(invalid="ignore"):
            legal = (lm1 < lag1 + tolerance) & (lm1 > lag1 - tolerance)
            legal &= (lm2 < lag2 + tolerance) & (lm2 > lag2 - tolerance)
        return tuple(np.unravel_index(np.argmax(legal > 0), legal.shape, "F"))

    def _feasible_cell(self, group):
        """Joint feasibility through the ``feasibility_tols`` cascade:
        the first tolerance tier with a feasible cell wins; ``(0, 0)``
        when every tier is empty.

        The reference checks ONE tier at 1 cm (multilateration.py:413-426,
        tolerance=1) and silently drops the completed group when no grid
        cell satisfies both lag bands jointly — but each band is ~1 cell
        wide, and for hits close to a sensor the two bands become nearly
        concentric circles around it, so at cm quantization they can cross
        without SHARING a cell (grid aliasing; the reference's own
        ``TODO: INVESTIGATE THIS`` sits on this path, :508).  Measured on
        a random-hit stream this drops ~1% of genuine strikes.  A second
        2 cm tier recovers them: trilateration refines from the coarser
        cell just as well (Newton converges from anywhere on the head).
        Default ``(1.0,)`` preserves exact reference emission parity.
        """
        res = (0, 0)
        for t in getattr(self, "feasibility_tols", (1.0,)):
            res = self.is_legal_3d(group, tolerance=t)
            if res != (0, 0):
                break
        return res


class Multilaterate3D(_LagMapsMixin):
    """Streaming 3D-sensor locator (multilateration.py:319-575).

    Feed onset events one at a time via :meth:`locate`; when three mutually
    feasible onsets accumulate, returns the trilaterated (x, y) — via the
    Gauss-Newton solver or an injected learned model (lags → coordinates).
    """

    def __init__(
        self,
        sensor_locations,
        drum_diameter: float = DIAMETER,
        medium: str = "drumhead",
        sr: int = 44100,
        c: Optional[float] = None,
        model=None,
        model_input: str = "arrival",
        feasibility_tols: tuple = (1.0,),
    ):
        self.c = speed_of_sound(100, medium=medium) if c is None else c * 100
        self.model = model
        #: completion-feasibility tolerance cascade in cm (see
        #: :meth:`_LagMapsMixin._feasible_cell`); (1.0,) = reference parity
        self.feasibility_tols = tuple(feasibility_tols)
        if model_input not in ("arrival", "by_channel"):
            raise ValueError(f"unknown model_input {model_input!r}")
        if model_input == "by_channel" and len(sensor_locations) != 3:
            raise ValueError(
                "model_input='by_channel' needs exactly 3 sensors"
            )
        self.model_input = model_input
        self.radius = drum_diameter / 2
        self.sensor_locs = [
            tuple(
                float(v)
                for v in spherical_to_cartesian(x[0] * self.radius, x[1], x[2])
            )
            for x in sensor_locations
        ]
        self.medium = medium
        self.sr = sr
        self.samples_per_cm = sr / self.c
        self._build_maps(lag_map_3d, drum_diameter, sr, c=self.c)
        self.ongoing: list = []

    def locate(self, sensor_index: int, onset_index: int, rec_audio=None):
        """Process one onset event; returns (x, y) when a hit completes,
        else None.  ``rec_audio`` optionally enables CC onset refinement
        against the live ring (multilateration.py:457-501)."""
        new_groups = []
        for group in self.ongoing:
            lag = onset_index - group[1][0]
            if lag > self.max_max_lags[group[0][0]]:
                continue
            if lag < 0:
                # An adjustment moved an onset behind the next: swap seed.
                inter = (group[0][0], group[1][0])
                group[0][0] = sensor_index
                group[1][0] = onset_index
                sensor_index, onset_index = inter
                lag = -lag
            if sensor_index not in group[0]:
                if rec_audio is not None:
                    lag, onset_index = self._refine(
                        group, sensor_index, onset_index, rec_audio, lag
                    )
                if self.is_legal(group[0][0], sensor_index, lag):
                    group = (
                        group[0] + [sensor_index],
                        group[1] + [onset_index],
                    )
                    if len(group[0]) == 3:
                        if group[0][0] == group[0][1]:
                            break
                        res = self._feasible_cell(group)
                        if res != (0, 0):
                            guess = np.array(res) - self.radius
                            res = self.trilaterate(group, initial_guess=guess)
                            if res is not None:
                                new_groups = remove_seed(new_groups, group)
                            self.ongoing = new_groups
                            return res
                    new_groups.append(group)
            if lag <= self.max_max_lags[group[0][0]]:
                new_groups.append(group)
        new_groups.append(([sensor_index], [onset_index]))
        self.ongoing = new_groups
        return None

    def _refine(self, group, sensor_index, onset_index, rec_audio, lag):
        """CC-refine the new onset against the group seed using live audio
        (multilateration.py:457-501)."""
        last_onset = group[1][0]
        i = rec_audio.counter - last_onset + LOOKAROUND
        section = np.asarray(rec_audio[-i - 1 :])[:, [group[0][0], sensor_index]]
        section = np.diff(median_filter(section, 5, axes=0), axis=0)
        section[section >= 0] = 0
        section = np.abs(section)
        section_og = np.array([last_onset, onset_index]) - (
            last_onset - LOOKAROUND
        )
        new_lag = cross_correlation_lag(
            section[:, 0],
            section[:, 1],
            onsets=(group[1][0], onset_index),
            d=0,
            onset_tolerance=ONSET_TOL,
            normalization_cutoff=NORM_CUTOFF,
        )
        if new_lag is not None:
            lag = new_lag
            co, cn = adjust_onset(
                section_og, section[:, 0], section[:, 1], lag
            )
            group[1][0] += co
            onset_index += cn
        return lag, onset_index

    def trilaterate(self, group, initial_guess):
        # NOTE: the reference reorders sensors when group[0][1] == 1
        # (multilateration.py:542-544), which degenerates to a duplicated
        # origin sensor for seeds other than its hard-coded setup (its own
        # TODO acknowledges the baked-in order assumption).  We keep the
        # group's natural (seed, a, b) order for all configurations.
        sensors, onsets = group[0], group[1]
        d_a1 = onsets[1] - onsets[0]
        d_b1 = onsets[2] - onsets[0]
        if self.model is not None:
            # learned model maps lag features → meters; our scale is cm
            if self.model_input == "by_channel":
                # adjacent channel-order diffs = np.diff (calibration.py:347)
                by_ch = np.zeros(3, dtype=np.float64)
                by_ch[list(sensors)] = onsets
                feats = tuple(np.diff(by_ch))
            else:
                feats = (d_a1, d_b1)
            return self.model.call_np(feats) * 100
        triple = jnp.array(
            [
                self.sensor_locs[sensors[0]],
                self.sensor_locs[sensors[1]],
                self.sensor_locs[sensors[2]],
            ],
            dtype=jnp.float32,
        )
        deltas = jnp.array(
            [d_a1 / self.sr * self.c, d_b1 / self.sr * self.c],
            dtype=jnp.float32,
        )
        p, ok = solve_tdoa(
            triple, deltas, jnp.asarray(initial_guess, dtype=jnp.float32)
        )
        return tuple(map(float, p)) if bool(ok) else None


class Multilaterate(_LagMapsMixin):
    """2D-sensor variant returning polar coordinates
    (multilateration.py:578-733)."""

    def __init__(
        self,
        sensor_locations,
        drum_diameter: float = DIAMETER,
        medium: str = "drumhead",
        sr: int = 44100,
        feasibility_tols: tuple = (1.0,),
    ):
        self.radius = drum_diameter / 2
        self.sensor_locs = [
            tuple(
                float(v) for v in polar_to_cartesian(x[0] * self.radius, x[1])
            )
            for x in sensor_locations
        ]
        self.medium = medium
        self.sr = sr
        self.samples_per_cm = sr / speed_of_sound(100, medium=medium)
        self.feasibility_tols = tuple(feasibility_tols)
        self._build_maps(lag_map_2d, drum_diameter, sr)
        self.ongoing: list = []

    def locate(self, sensor_index: int, onset_index: int):
        new_groups = []
        for group in self.ongoing:
            lag = onset_index - group[1][0]
            if sensor_index not in group[0]:
                if self.is_legal(group[0][0], sensor_index, lag):
                    group = (
                        group[0] + [sensor_index],
                        group[1] + [onset_index],
                    )
                    if len(group[0]) == 3:
                        res = self._feasible_cell(group)
                        if res != (0, 0):
                            res = self.trilaterate(
                                group, np.array(res) - self.radius
                            )
                            self.ongoing = new_groups
                            return res
                    new_groups.append(group)
            if lag <= self.max_max_lags[group[0][0]]:
                new_groups.append(group)
        new_groups.append(([sensor_index], [onset_index]))
        self.ongoing = new_groups
        return None

    def trilaterate(self, group, initial_guess):
        sensors, onsets = group[0], group[1]
        c = speed_of_sound(100, medium=self.medium)
        d_a1 = (onsets[1] - onsets[0]) * c / self.sr
        d_b1 = (onsets[2] - onsets[0]) * c / self.sr
        res = solve_trilateration(
            self.sensor_locs[sensors[1]],
            self.sensor_locs[sensors[2]],
            self.sensor_locs[sensors[0]],
            d_a1,
            d_b1,
            initial_guess,
        )
        if res is None:
            return None
        r, phi = cartesian_to_polar(res[0], res[1], self.radius)
        return float(r), float(phi)


class MultilateratePaired:
    """Neighbor-pair lag-map voting locator (multilateration.py:736-875).

    Precomputes lag maps between adjacent sensors; at locate time, CC lags of
    adjacent pairs vote on map cells and the argmax cell wins.
    """

    def __init__(
        self,
        sensor_locations,
        drum_diameter: float = DIAMETER,
        scale: float = 10,
        medium: str = "drumhead",
        sr: int = 44100,
    ):
        self.radius = int(np.round(drum_diameter * scale / 2, 1))
        self.sensor_locs = [
            tuple(
                float(v) for v in polar_to_cartesian(x[0] * self.radius, x[1])
            )
            for x in sensor_locations
        ]
        self.scale = scale
        self.medium = medium
        self.sr = sr
        self.lag_maps = [dict() for _ in range(len(self.sensor_locs))]
        for i in range(len(self.sensor_locs)):
            for k in (-1, 1):
                j = (i + k) % len(self.sensor_locs)
                self.lag_maps[i][j] = np.asarray(
                    lag_map_2d(
                        self.sensor_locs[i],
                        self.sensor_locs[j],
                        d=drum_diameter,
                        sr=sr,
                        scale=scale,
                        medium="drumhead",
                    )
                )
        self.res = np.zeros_like(self.lag_maps[0][1])

    def locate(self, lags: list[int], i: int):
        """Direct trilateration from neighbor-pair lags with an
        intensity-weighted initial guess (multilateration.py:802-832)."""
        js = [(i - 1) % len(self.sensor_locs), (i + 1) % len(self.sensor_locs)]
        sensor_a = self.sensor_locs[js[0]]
        sensor_b = self.sensor_locs[js[1]]
        sensor_origin = self.sensor_locs[i]
        c = speed_of_sound(100 * self.scale, medium=self.medium)
        d_a1 = lags[0] * c / self.sr
        d_b1 = lags[1] * c / self.sr
        wa = abs(d_a1) / self.radius
        wb = abs(d_b1) / self.radius
        wo = abs(d_a1 + d_b1) / (2 * self.radius)
        guess = np.array(
            [
                sensor_a[0] * wa + sensor_b[0] * wb + sensor_origin[0] * wo,
                sensor_a[1] * wa + sensor_b[1] * wb + sensor_origin[1] * wo,
            ]
        )
        res = solve_trilateration(
            sensor_a, sensor_b, sensor_origin, d_a1, d_b1, guess
        )
        if res is None:
            return None
        r, phi = cartesian_to_polar(res[0], res[1], self.radius)
        return float(r), float(phi)

    def locate_cc(
        self,
        x: np.ndarray,
        onset_idx: int,
        i: int,
        tol: int = 2,
        left: int = 0,
        right: int = 256,
    ):
        """Lag-map voting from CC lags of each adjacent pair
        (multilateration.py:834-875)."""
        self.res[:] = 0
        for j in self.lag_maps[i]:
            lag = find_lag(
                x[onset_idx - left : onset_idx + right, i],
                x[onset_idx - left : onset_idx + right, j],
            )
            with np.errstate(invalid="ignore"):
                self.res += (self.lag_maps[i][j] < lag + tol) & (
                    self.lag_maps[i][j] > lag - tol
                )
        coord = np.unravel_index(np.argmax(self.res), self.res.shape)
        px = coord[1] - (self.res.shape[1] - 1) / 2
        py = (self.res.shape[0] - 1) / 2 - coord[0]
        r, phi = cartesian_to_polar(px, py, self.radius)
        return float(r), float(phi)


# ---------------------------------------------------------------------------
# Jittable fixed-capacity locator core (for the fused realtime engine)
# ---------------------------------------------------------------------------

# "Infinity" for masked int32 age comparisons.  Must exceed every real
# age: ages rebase once ``next_age`` passes ``_AGE_REBASE`` (active groups
# are short-lived — their span stays tiny), so real ages never reach this.
# Plain Python ints: a module-level ``jnp`` op would run on the default
# device at import time (see parallel/sharding.py's _BIG note).
_AGE_INF = 2**31 - 1
_AGE_REBASE = 2**30


class LocatorState(NamedTuple):
    """Padded candidate-group table: slot g holds up to 3 (sensor, onset)
    members; ``count == 0`` marks a free slot."""

    sensors: jnp.ndarray  # [G, 3] int32, -1 padded
    onsets: jnp.ndarray   # [G, 3] int32
    count: jnp.ndarray    # [G] int32
    age: jnp.ndarray      # [G] int32 insertion order (for eviction)
    next_age: jnp.ndarray  # scalar int32


@dataclass(frozen=True)
class LocatorConfig:
    """Static data for the jitted locator (arrays are packed as device
    constants via closure)."""

    n_sensors: int
    capacity: int = 8
    tolerance_cm: float = 1.0


def locator_init(capacity: int = 8) -> LocatorState:
    g = capacity
    return LocatorState(
        sensors=jnp.full((g, 3), -1, dtype=jnp.int32),
        onsets=jnp.zeros((g, 3), dtype=jnp.int32),
        count=jnp.zeros((g,), dtype=jnp.int32),
        age=jnp.zeros((g,), dtype=jnp.int32),
        next_age=jnp.zeros((), dtype=jnp.int32),
    )


def build_locator_tables(m: Multilaterate3D):
    """Pack a host locator's lag maps into dense device arrays:
    (lag_maps [S, S, H, W] nan-padded, min_lags, max_lags, max_max_lags,
    sensor_xyz [S, 3])."""
    s = len(m.sensor_locs)
    h, w = next(iter(m.lag_maps[0].values())).shape
    maps = np.full((s, s, h, w), np.nan, dtype=np.float32)
    min_l = np.full((s, s), np.inf, dtype=np.float32)
    max_l = np.full((s, s), -np.inf, dtype=np.float32)
    for i in range(s):
        for j, lm in m.lag_maps[i].items():
            maps[i, j] = lm
            min_l[i, j] = m.min_lags[i][j]
            max_l[i, j] = m.max_lags[i][j]
    mml = np.asarray(m.max_max_lags, dtype=np.float32)
    xyz = np.asarray(m.sensor_locs, dtype=np.float32)
    return (
        jnp.asarray(maps),
        jnp.asarray(min_l),
        jnp.asarray(max_l),
        jnp.asarray(mml),
        jnp.asarray(xyz),
    )


def make_locate_update(
    m: Multilaterate3D,
    capacity: int = 8,
    cc_refine: bool = False,
    model=None,
    model_input: str = "arrival",
):
    """Build a jitted locate step.

    Signature without refinement: ``(state, sensor, onset) -> (state, xy,
    valid)``.  With ``cc_refine=True`` the step additionally takes
    ``(window [W, C], win_start)`` — a fixed-length slice of live audio
    ending 'now' (use ``update.window_len``) — and refines the incoming
    onset against the candidate group's seed by masked cross-correlation
    before the legality checks, the jittable equivalent of the reference's
    live-buffer refinement (multilateration.py:457-501), including the
    energy heuristic that may move the *seed* instead of the new onset
    (adjust_onset) and the seed swap when refinement puts the new onset
    first (multilateration.py:443-449).  Known deviation: the reference
    refines against EVERY candidate group while iterating; this step
    refines against one candidate (the oldest matching group) — identical
    whenever at most one group is live for the incoming onset (the
    common case), diverging only when overlapping strikes keep several
    candidate seeds alive at once.

    Captures the locator's lag maps/sensor geometry as device constants.
    Semantics follow Multilaterate3D.locate: negative-lag seed swap when
    an adjusted onset arrives before a live group's seed
    (multilateration.py:443-449; against the oldest such group — see the
    in-body note), group join on pairwise legality, 3-way completion via
    joint lag-map feasibility (argmax cell as the Newton initial guess),
    trilateration on completion, seed dedup, slot eviction of stale
    groups.

    ``model``: optional ``models.fcnn.FCNNBundle`` — replaces the Newton
    solve with the learned lags→(x, y) model inside the same device program
    (the reference calls its torch FCNN on host per hit,
    multilateration.py:555-557).

    ``model_input`` selects the model's feature representation:

    - ``"arrival"`` (default, reference parity): the pair of
      arrival-order sample lags ``(second−first, third−first)``
      (multilateration.py:555-557).  Ambiguous across the full head —
      mirror-symmetric positions produce identical pairs — and
      inconsistent with the reference's own TRAINING convention, which is
      fixed-channel-order ``np.diff(onsets)`` (calibration.py:347).
    - ``"by_channel"``: fixed-channel-order ADJACENT sample lags
      ``np.diff(onsets)`` = ``(onset[1]−onset[0], onset[2]−onset[1])``
      (may be negative) — exactly the reference's training convention
      (calibration.py:347), and unambiguous, so a model trained on mined
      POSD onsets serves anywhere on the head.  Requires a 3-sensor
      configuration (every group then contains all channels).
    """
    from onset_fingerprinting_tpu.detect.refine import cc_refine_adjust_jax

    if model_input not in ("arrival", "by_channel"):
        raise ValueError(f"unknown model_input {model_input!r}")
    if model_input == "by_channel" and len(m.sensor_locs) != 3:
        raise ValueError(
            "model_input='by_channel' needs exactly 3 sensors (groups "
            "complete on the 3rd arrival, so with more sensors some "
            "channels would be absent from the feature vector)"
        )
    maps, min_l, max_l, mml, xyz = build_locator_tables(m)
    radius = float(m.radius)
    samples_per_cm = float(m.samples_per_cm)
    # completion-feasibility tolerance cascade (cm tiers, inherited from
    # the host locator — see _LagMapsMixin._feasible_cell): the first tier
    # with a feasible cell wins; (1.0,) is exact reference parity
    feas_tols = tuple(
        samples_per_cm * float(t)
        for t in getattr(m, "feasibility_tols", (1.0,))
    )
    c_over_sr = float(m.c / m.sr)
    h, w = maps.shape[2:]
    window_len = int(
        -(-(LOOKAROUND + float(np.nanmax(mml)) + 256) // 128) * 128
    )

    def update(
        state: LocatorState,
        sensor: jnp.ndarray,
        onset: jnp.ndarray,
        window: jnp.ndarray | None = None,
        win_start: jnp.ndarray | None = None,
    ):
        sensor = sensor.astype(jnp.int32)
        onset = onset.astype(jnp.int32)

        # Negative-lag seed swap (multilateration.py:443-449): an
        # adjustment (backtracking / CC refinement) delivered this onset
        # EARLIER than a live group's seed — the earlier onset must seed
        # the group, so the reference swaps the group seed with the
        # incoming onset in-loop and continues the scan with the swapped
        # identity.  With fixed-capacity slots we swap against the OLDEST
        # such group (insertion order — the first the reference's loop
        # reaches); identical whenever one group has a negative lag (the
        # common case — out-of-order onsets need backtracking to cross a
        # block boundary), the same bounded single-candidate deviation as
        # the cc_refine path below.  The swap can leave a duplicate-sensor
        # group when the incoming sensor is already a non-seed member of
        # the swapped group (the reference drops such a group at
        # completion via its group[0][0] == group[0][1] break); here the
        # slot lives on inert — its completion feasibility reads
        # maps[i, i], which is nan-padded, so every grid cell is
        # infeasible and the slot can never emit; it just occupies
        # capacity until it ages out.
        lag_pre = onset - state.onsets[:, 0]
        swap_c = (state.count > 0) & (lag_pre < 0)
        any_swap = jnp.any(swap_c)
        gswap = jnp.argmin(jnp.where(swap_c, state.age, _AGE_INF))
        old_seed_s = state.sensors[gswap, 0]
        old_seed_o = state.onsets[gswap, 0]
        swapped_sensors = state.sensors.at[gswap, 0].set(
            jnp.where(any_swap, sensor, old_seed_s)
        )
        swapped_onsets = state.onsets.at[gswap, 0].set(
            jnp.where(any_swap, onset, old_seed_o)
        )
        state = state._replace(sensors=swapped_sensors, onsets=swapped_onsets)
        sensor = jnp.where(any_swap, old_seed_s, sensor)
        onset = jnp.where(any_swap, old_seed_o, onset)

        if cc_refine:
            assert window is not None and win_start is not None
            seed0 = jnp.maximum(state.sensors[:, 0], 0)
            lag0 = (onset - state.onsets[:, 0]).astype(jnp.float32)
            cand = (
                (state.count > 0)
                & (lag0 >= 0)
                & (lag0 <= mml[seed0])
                & ~jnp.any(
                    (state.sensors == sensor)
                    & (jnp.arange(3) < state.count[:, None]),
                    axis=1,
                )
            )
            # oldest candidate = the one the reference refines first
            # (insertion order); slots are recycled out of order
            gj = jnp.argmin(
                jnp.where(cand, state.age, jnp.int32(_AGE_INF))
            )
            o0 = state.onsets[gj, 0]
            s0 = seed0[gj]
            pos0 = o0 - win_start
            pos1 = onset - win_start
            pair = jnp.stack(
                [window[:, s0], window[:, sensor]], axis=1
            )
            c_seed, c_new, ok = cc_refine_adjust_jax(
                pair, pos0, pos1,
                lookaround=LOOKAROUND,
                onset_tolerance=ONSET_TOL,
                normalization_cutoff=NORM_CUTOFF,
            )
            # energy heuristic moves either the seed or the new onset
            # (adjust_onset, multilateration.py:491-499)
            do = jnp.any(cand) & ok
            onset = onset + jnp.where(do, c_new, 0)
            seed_onset = o0 + jnp.where(do, c_seed, 0)
            # if the refined new onset now precedes the seed, swap them —
            # the earlier onset must seed the group (multilateration.py:443-449)
            neg = do & (onset < seed_onset)
            new_seed_s = jnp.where(neg, sensor, state.sensors[gj, 0])
            new_seed_o = jnp.where(neg, onset, seed_onset)
            sensor = jnp.where(neg, s0, sensor)
            onset = jnp.where(neg, seed_onset, onset)
            state = state._replace(
                sensors=state.sensors.at[gj, 0].set(new_seed_s),
                onsets=state.onsets.at[gj, 0].set(new_seed_o),
            )

        lag = (onset - state.onsets[:, 0]).astype(jnp.float32)  # [G]
        seed = state.sensors[:, 0]
        seed_safe = jnp.maximum(seed, 0)
        active = state.count > 0
        alive = active & (lag <= mml[seed_safe])
        member = jnp.any(
            (state.sensors == sensor) & (jnp.arange(3) < state.count[:, None]),
            axis=1,
        )
        legal_pair = (min_l[seed_safe, sensor] < lag) & (
            lag < max_l[seed_safe, sensor]
        )
        joinable = alive & ~member & legal_pair & (state.count < 3)

        completes = joinable & (state.count == 2)

        # Per-group lag-map feasibility for EVERY completing candidate:
        # the reference returns at the FIRST completing group in
        # insertion order whose lag-map cell is feasible
        # (multilateration.py:507-527) — an infeasible completer earlier
        # in the scan does NOT return (it stays alive as an inert
        # 3-member group, :531), so it must not mask a feasible one
        # later.  G is small (the slot capacity), so the [G, h, w]
        # gather is cheap.
        s1_all = jnp.maximum(state.sensors[:, 1], 0)
        lag1_all = (state.onsets[:, 1] - state.onsets[:, 0]).astype(
            jnp.float32
        )
        lag2_all = (onset - state.onsets[:, 0]).astype(jnp.float32)
        lm1_all = maps[seed_safe, s1_all]  # [G, h, w]
        lm2_all = maps[seed_safe, sensor]  # [G, h, w]
        # The reference's C-order argmax + F-order unravel on a square grid
        # (multilateration.py:425) effectively yields (col, row) = (x+r, y+r)
        # for map cell [row, col] (meshgrid 'xy': x = col - r, y = row - r).
        # One mask per tolerance tier; per group the FIRST feasible tier's
        # argmax cell wins (tiers nest, so a tier-1 hit is also a tier-2
        # hit — argmax over ok_t picks the tightest).
        cells, oks = [], []
        for tol in feas_tols:
            legal_t = (
                (lm1_all < lag1_all[:, None, None] + tol)
                & (lm1_all > lag1_all[:, None, None] - tol)
                & (lm2_all < lag2_all[:, None, None] + tol)
                & (lm2_all > lag2_all[:, None, None] - tol)
            )
            flat_t = legal_t.transpose(0, 2, 1).reshape(
                legal_t.shape[0], -1
            )  # column-major per group
            idx_t = jnp.argmax(flat_t, axis=1)
            cell_t = jnp.stack(
                [idx_t // h, idx_t % h], axis=1
            ).astype(jnp.float32)  # [G, 2] (col, row)
            cells.append(cell_t)
            oks.append(
                jnp.any(flat_t, axis=1) & jnp.any(cell_t != 0, axis=1)
            )
        ok_t = jnp.stack(oks)  # [T, G]
        tier = jnp.argmax(ok_t, axis=0)  # first feasible tier per group
        grid_ok_all = jnp.any(ok_t, axis=0)
        cell_all = jnp.take_along_axis(
            jnp.stack(cells), tier[None, :, None], axis=0
        )[0]  # [G, 2]
        feasible = completes & grid_ok_all
        returned = jnp.any(feasible)
        # oldest feasible completer (insertion order = ascending age)
        comp_age = jnp.where(feasible, state.age, jnp.int32(_AGE_INF))
        gidx = jnp.argmin(comp_age)

        # --- completion path (computed unconditionally, masked by validity)
        s0 = seed_safe[gidx]
        s1 = s1_all[gidx]
        o0 = state.onsets[gidx, 0]
        o1 = state.onsets[gidx, 1]
        lag1 = lag1_all[gidx]
        lag2 = lag2_all[gidx]
        cell = cell_all[gidx]
        guess = cell - radius
        triple = jnp.stack([xyz[s0], xyz[s1], xyz[sensor]])
        deltas = jnp.stack([lag1, lag2]) * c_over_sr
        if model is not None:
            # learned trilateration bypass (multilateration.py:555-557):
            # FCNN maps the lag features → meters; our scale is cm.  Fully
            # jittable — no host round-trip, unlike the reference's
            # torch call_np in the audio callback.
            if model_input == "by_channel":
                # scatter the 3 group onsets into channel order; adjacent
                # diffs (np.diff — the reference's training rows,
                # calibration.py:347) in int32 BEFORE the float cast
                # (onsets grow unboundedly)
                ids = jnp.stack([s0, s1, sensor]).astype(jnp.int32)
                ons = jnp.stack(
                    [o0, o1, onset]
                ).astype(jnp.int32)
                by_ch = jnp.zeros((3,), jnp.int32).at[ids].set(ons)
                feats = (by_ch[1:] - by_ch[:-1]).astype(jnp.float32)
            else:
                feats = jnp.stack([lag1, lag2])
            pred = model.model.apply(
                model.variables,
                feats[None, :],
                train=False,
            )[0]
            point = pred * 100.0
            solved = jnp.all(jnp.isfinite(point))
        else:
            # unrolled masked Newton: the update runs inside per-block
            # serve programs where lax.while_loop's per-iteration thunk
            # overhead dominates (identical results — see solve_tdoa)
            point, solved = solve_tdoa(triple, deltas, guess, unroll=True)
        emit = returned & solved

        # --- state update.  Joins apply to completing groups too: an
        # INFEASIBLE completer keeps its third member and lives on inert
        # (count 3 blocks further joins) until its lag ages out — the
        # reference appends exactly that 3-member group
        # (multilateration.py:502-531; its duplicate second append is a
        # quirk not replicated — capacity-bounded slots, and duplicates
        # only matter there after a completion that already purges them).
        join_now = joinable
        slot_pos = jnp.clip(state.count, 0, 2)
        new_sensors = jnp.where(
            join_now[:, None]
            & (jnp.arange(3)[None] == slot_pos[:, None]),
            sensor,
            state.sensors,
        )
        new_onsets = jnp.where(
            join_now[:, None]
            & (jnp.arange(3)[None] == slot_pos[:, None]),
            onset,
            state.onsets,
        )
        new_count = state.count + join_now.astype(jnp.int32)

        # drop dead groups.  On a feasible completion the reference
        # RETURNS mid-loop (multilateration.py:512-531): the completed
        # group is consumed, every group AFTER it in iteration
        # (insertion/age) order is discarded wholesale, and remove_seed
        # (multilateration.py:160-167) prunes earlier seed-sharers only
        # when the solve succeeded.
        same_seed = (
            (state.sensors[:, 0] == state.sensors[gidx, 0])
            & (state.onsets[:, 0] == state.onsets[gidx, 0])
        )
        later_or_self = state.age >= state.age[gidx]
        keep = alive & ~(returned & later_or_self) & ~(emit & same_seed)
        new_count = jnp.where(keep, new_count, 0)

        # insert the fresh single-member group: prefer a free slot, else
        # evict the oldest active group (smallest age).  NOT on the
        # completion path: the reference returns before its singleton
        # append (multilateration.py:512-527 vs 531) — whenever a group
        # reached 3 members with a feasible lag-map cell, even if the
        # solve then failed — so the completing onset never seeds a
        # group (a bounce joining that phantom seed could emit a second
        # point for the same strike).
        free = new_count == 0
        # free slots must always lose to active ones: bias them below any
        # real age (ages are rebased to stay < _AGE_REBASE, so the offset
        # cannot underflow int32)
        evict_score = jnp.where(
            free, state.age - jnp.int32(_AGE_REBASE), state.age
        )
        ins = jnp.argmin(evict_score)
        ins_sensors = new_sensors.at[ins].set(jnp.full((3,), -1, jnp.int32))
        ins_sensors = ins_sensors.at[ins, 0].set(sensor)
        new_sensors = jnp.where(returned, new_sensors, ins_sensors)
        new_onsets = jnp.where(
            returned, new_onsets, new_onsets.at[ins, 0].set(onset)
        )
        new_count = jnp.where(
            returned, new_count, new_count.at[ins].set(1)
        )
        new_age = jnp.where(
            returned, state.age, state.age.at[ins].set(state.next_age)
        )
        new_next = state.next_age + 1

        # Age rebase: next_age grows by one per update without bound; the
        # _AGE_INF sentinels and the evict-score bias both assume real
        # ages stay below _AGE_REBASE.  Active groups age out within a
        # few hundred samples, so once next_age crosses the threshold the
        # live span is tiny — shift everything down by the smallest
        # active age (free-slot ages are never read unmasked).
        base = jnp.min(jnp.where(new_count > 0, new_age, new_next))
        shift = jnp.where(new_next > jnp.int32(_AGE_REBASE), base, 0)
        # zero (not shift) free slots so repeated rebases can't compound
        # their stale ages toward int32 underflow
        rebased_age = jnp.where(
            new_count > 0,
            new_age - shift,
            jnp.where(shift > 0, 0, new_age),
        )

        new_state = LocatorState(
            sensors=new_sensors,
            onsets=new_onsets,
            count=new_count,
            age=rebased_age,
            next_age=new_next - shift,
        )
        return new_state, point, emit

    jitted = jax.jit(update)
    jitted.window_len = window_len
    return jitted
