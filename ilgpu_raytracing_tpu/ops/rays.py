"""Primary ray generation from the camera plane parametrization."""

from __future__ import annotations

import jax.numpy as jnp

from ilgpu_raytracing_tpu.utils import vec


def generate_rays(camera, u: jnp.ndarray, v: jnp.ndarray):
    """Rays through normalized plane coords (u, v) in [0,1]
    (reference RTUtils.cs Ray.GenerateRay:13-17).

    Returns (o, d): (N,3) each; o is the broadcast camera origin.
    """
    origin = jnp.asarray(camera.origin, jnp.float32)
    lower_left = jnp.asarray(camera.lower_left, jnp.float32)
    horizontal = jnp.asarray(camera.horizontal, jnp.float32)
    vertical = jnp.asarray(camera.vertical, jnp.float32)
    d = (
        lower_left
        + horizontal * u[..., None]
        + vertical * v[..., None]
        - origin
    )
    d = vec.normalize(d)
    o = jnp.broadcast_to(origin, d.shape)
    return o, d


def pixel_centers(width: int, height: int):
    """Flat pixel-center (u, v) grid in the frame's block-linear order
    (ops/layout.py), v up (reference GBufferParams.PrimaryRay,
    RTRay.cs:119-127; the reference is row-major -- the order here is a
    TPU packet-coherence redesign, values per pixel are identical)."""
    from ilgpu_raytracing_tpu.ops import layout

    idx = jnp.arange(width * height, dtype=jnp.int32)
    x, y = layout.xy_from_position(idx, width, height)
    u = (x.astype(jnp.float32) + 0.5) / float(max(1, width))
    v = (y.astype(jnp.float32) + 0.5) / float(max(1, height))
    return u, v


def generate_primary_rays(camera, width: int, height: int):
    u, v = pixel_centers(width, height)
    return generate_rays(camera, u, v)
