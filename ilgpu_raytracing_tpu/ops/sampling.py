"""Directional sampling (cosine hemisphere) and pdfs (RTRay.cs:585-606,
630-634)."""

from __future__ import annotations

import jax.numpy as jnp

from ilgpu_raytracing_tpu.utils import rng as rng_mod
from ilgpu_raytracing_tpu.utils import vec

INV_PI = 0.31830988618379067154


def sample_hemisphere_cosine(n: jnp.ndarray, state: jnp.ndarray):
    """Cosine-weighted hemisphere sample around unit normal n.

    Returns (new_rng_state, wi). Two RNG draws per lane (RTRay.cs:586-598).
    """
    state, r1 = rng_mod.next_float(state)
    state, r2 = rng_mod.next_float(state)
    phi = 2.0 * jnp.pi * r1
    cos_theta = jnp.sqrt(1.0 - r2)
    sin_theta = jnp.sqrt(r2)
    x = jnp.cos(phi) * sin_theta
    y = jnp.sin(phi) * sin_theta
    z = cos_theta
    t, b = vec.orthonormal_basis(n)
    wi = t * x[..., None] + b * y[..., None] + n * z[..., None]
    return state, vec.normalize(wi)


def cos_hemisphere_pdf(n: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    nl = jnp.maximum(0.0, vec.dot(n, wi))
    return nl * INV_PI
