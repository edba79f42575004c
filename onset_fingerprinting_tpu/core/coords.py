"""Coordinate transforms and the sound-propagation medium model.

jnp-native (scalar- and array-polymorphic, jit/vmap-friendly) equivalents of
the reference geometry helpers (reference: onset_fingerprinting/
multilateration.py:10-157).  Angle conventions match the reference exactly:

- 2D polar: ``phi`` in degrees, measured counter-clockwise from East (+x),
  wrapped to ``[0, 360)``.
- 3D spherical: the reference uses a drum-centric elevation convention
  (multilateration.py:92-95,119-122): an input ``theta >= 0`` is elevation
  above the x-y plane (converted internally to inclination ``90 - theta``),
  while a *negative* theta is used verbatim as inclination.
"""

from __future__ import annotations

import jax.numpy as jnp

TEMPERATURE = 20.0
HUMIDITY = 0.5
#: 14" drum diameter in centimeters (multilateration.py:12)
DIAMETER = 14 * 2.54
#: wave speed through a drumhead membrane, m/s (multilateration.py:15)
C_DRUMHEAD = 82.0
MEDIUM = "air"
STRIKE_FORCE = 1.0


def speed_of_sound(
    scale: float = 1.0,
    temperature: float = TEMPERATURE,
    humidity: float = HUMIDITY,
    medium: str = MEDIUM,
) -> float:
    """Speed of sound in m/s (times ``scale``).

    Air model and drumhead constant match multilateration.py:23-39.
    """
    if medium == "air":
        return scale * (331.3 + 0.606 * temperature) * (1 + 0.0124 * humidity)
    return scale * C_DRUMHEAD


def cartesian_to_polar(x, y, r=None):
    """(x, y) → (r, phi°); ``r`` argument normalizes the returned radius."""
    radius = jnp.sqrt(x**2 + y**2)
    if r is not None:
        radius = radius / r
    phi = jnp.arctan2(y, x) % (2 * jnp.pi)
    return radius, jnp.degrees(phi)


def polar_to_cartesian(r, phi):
    """(r, phi°) → (x, y)."""
    phi = jnp.radians(phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def spherical_to_cartesian(r, phi, theta):
    """Drum-convention spherical → cartesian (multilateration.py:75-102).

    ``theta >= 0`` is elevation above the playing surface; negative theta is
    used directly as inclination.
    """
    phi = jnp.radians(phi)
    incl = jnp.where(jnp.asarray(theta) < 0, -jnp.asarray(theta), 90.0 - jnp.asarray(theta))
    incl = jnp.radians(incl)
    x = r * jnp.cos(phi) * jnp.sin(incl)
    y = r * jnp.sin(phi) * jnp.sin(incl)
    z = r * jnp.cos(incl)
    return x, y, z


def cartesian_to_spherical(x, y, z):
    """Cartesian → drum-convention spherical (multilateration.py:105-123)."""
    r = jnp.sqrt(x**2 + y**2 + z**2)
    phi = jnp.arctan2(y, x) % (2 * jnp.pi)
    theta = jnp.degrees(jnp.arccos(z / r))
    theta = jnp.where(theta < 0, -theta, 90.0 - theta)
    return r, jnp.degrees(phi), theta


def cartesian_to_cylindrical(x, y, z, r=None):
    """Cartesian → (r, phi°, z) (multilateration.py:126-144)."""
    radius = jnp.sqrt(x**2 + y**2)
    if r is not None:
        radius = radius / r
    phi = jnp.arctan2(y, x) % (2 * jnp.pi)
    return radius, jnp.degrees(phi), z


def cylindrical_to_cartesian(r, phi, z):
    """(r, phi°, z) → cartesian (multilateration.py:147-157)."""
    phi = jnp.radians(phi)
    return r * jnp.cos(phi), r * jnp.sin(phi), z
