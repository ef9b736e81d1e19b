"""Tone mapping for the progressive-accumulation path (BASELINE config 4).

The reference presents clamped linear values (PackRGBA8 with saturate,
RTRay.cs:66-76); `clamp` reproduces that. ACES and Reinhard are
rebuild-added operators for HDR accumulation output.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamp(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(c, 0.0, 1.0)


def reinhard(c: jnp.ndarray) -> jnp.ndarray:
    return c / (1.0 + c)


def aces(c: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES fit."""
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


OPERATORS = {"clamp": clamp, "reinhard": reinhard, "aces": aces}
