"""Environment light: vertical sky gradient + animated directional sun.

(Reference: SkyWeighted RTRay.cs:163-168; sun animation
RTRenderer.cs:168-178.)
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sky_radiance(d: jnp.ndarray, tint_top, tint_bottom) -> jnp.ndarray:
    """lerp(bottom, top, 0.5*(dir.y + 1))."""
    t = 0.5 * (d[..., 1] + 1.0)
    top = jnp.asarray(tint_top, dtype=jnp.float32)
    bottom = jnp.asarray(tint_bottom, dtype=jnp.float32)
    return bottom * (1.0 - t)[..., None] + top * t[..., None]


def advance_sun_azimuth(azimuth: float, speed_rad_per_sec: float, dt: float) -> float:
    """dt-based sun azimuth integration with dt clamped to 0.1s and 2*pi wrap
    (RTRenderer.cs:169-172). Host-side helper."""
    dt = min(max(dt, 0.0), 0.1)
    az = azimuth + speed_rad_per_sec * dt
    two_pi = 2.0 * math.pi
    if az >= two_pi:
        az -= two_pi
    elif az < 0.0:
        az += two_pi
    return az


def sun_direction(azimuth: float, elevation: float):
    """Unit sun direction from azimuth/elevation (RTRenderer.cs:174-178)."""
    import numpy as np

    d = np.array(
        [
            math.cos(azimuth) * math.cos(elevation),
            math.sin(elevation),
            math.sin(azimuth) * math.cos(elevation),
        ],
        dtype=np.float32,
    )
    return d / np.linalg.norm(d)
