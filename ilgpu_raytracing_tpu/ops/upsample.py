"""Blit / bilinear upsample of packed color (non-TAAU present path,
reference RTRenderer.cs:281-320)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.utils import packing


@partial(jax.jit, static_argnames=("src_w", "src_h", "dst_w", "dst_h"))
def bilinear_upsample(src_packed, src_w: int, src_h: int, dst_w: int, dst_h: int):
    if (src_w, src_h) == (dst_w, dst_h):
        # block-linear src -> row-major presented frame (pure transpose)
        return layout.to_image(src_packed, src_w, src_h).reshape(-1)
    n = dst_w * dst_h
    idx = jnp.arange(n, dtype=jnp.int32)
    x = idx % dst_w
    y = idx // dst_w
    u = (x.astype(jnp.float32) + 0.5) * (float(src_w) / float(dst_w)) - 0.5
    v = (y.astype(jnp.float32) + 0.5) * (float(src_h) / float(dst_h)) - 0.5
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, src_w - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, src_h - 1)
    x1 = jnp.clip(x0 + 1, 0, src_w - 1)
    y1 = jnp.clip(y0 + 1, 0, src_h - 1)
    tx = jnp.clip(u - x0.astype(jnp.float32), 0.0, 1.0)[..., None]
    ty = jnp.clip(v - y0.astype(jnp.float32), 0.0, 1.0)[..., None]

    def fetch(xi, yi):
        # src is block-linear ordered (ops/layout.py)
        pos = layout.position_from_xy(xi, yi, src_w, src_h)
        return packing.unpack_rgb8(jnp.take(src_packed, pos, mode="clip"))

    c00 = fetch(x0, y0)
    c10 = fetch(x1, y0)
    c01 = fetch(x0, y1)
    c11 = fetch(x1, y1)
    cx0 = c00 * (1 - tx) + c10 * tx
    cx1 = c01 * (1 - tx) + c11 * tx
    return packing.pack_rgba8(cx0 * (1 - ty) + cx1 * ty)
