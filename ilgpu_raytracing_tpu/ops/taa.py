"""TAAU: temporal AA + upsample resolve (reference RTTaa.cs).

Pure function over packed uint32 color buffers: maps each output pixel to
low-res coords, reconstructs with the reference's smoothstep-weighted
"CatRom" taps in linearized sRGB (RTTaa.cs:204-229), builds a 3x3
neighborhood min/max from +-0.5-texel taps (:133-144), resets history on
objId disocclusion (:147-154), clamps history to the neighborhood, blends
with feedback, applies a light unsharp mask, and returns both the output and
the new history (the reference writes history in place, :168-170; here it
ping-pongs through the return value).

No motion vectors (motionScale=0 in the reference, :82-84).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.utils import packing


def _clampi(x, lo, hi):
    return jnp.clip(x, lo, hi)


def _sample_catrom_srgb(color_packed, w: int, h: int, x, y):
    """Smoothstep-weighted 2x2 reconstruction in linear space
    (RTTaa.cs:206-229)."""
    x1 = _clampi(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y1 = _clampi(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    fx = x - x1.astype(jnp.float32)
    fy = y - y1.astype(jnp.float32)
    x2 = jnp.minimum(x1 + 1, w - 1)
    y2 = jnp.minimum(y1 + 1, h - 1)

    def fetch(xi, yi):
        # low-res buffers are block-linear ordered (ops/layout.py)
        pos = layout.position_from_xy(xi, yi, w, h)
        return packing.unpack_srgb(jnp.take(color_packed, pos, mode="clip"))

    c00 = fetch(x1, y1)
    c10 = fetch(x2, y1)
    c01 = fetch(x1, y2)
    c11 = fetch(x2, y2)

    def catrom(a, b, t):
        tt = t * (2.0 - t)
        return a * (1.0 - tt)[..., None] + b * tt[..., None]

    cx0 = catrom(c00, c10, fx)
    cx1 = catrom(c01, c11, fx)
    return catrom(cx0, cx1, fy)


@partial(jax.jit, static_argnames=("in_w", "in_h", "out_w", "out_h"))
def resolve_upsample(
    low_color,  # (inN,) uint32 packed (written by the integrator present path)
    low_obj_id,  # (inN,) i32
    history_color,  # (outN,) uint32 packed
    history_obj_id,  # (outN,) i32
    history_valid,  # () bool/int scalar
    in_w: int,
    in_h: int,
    out_w: int,
    out_h: int,
    feedback: float = 0.075,
    sharpness: float = 0.10,
):
    n = out_w * out_h
    idx = jnp.arange(n, dtype=jnp.int32)
    px = idx % out_w
    py = idx // out_w

    sx = (px.astype(jnp.float32) + 0.5) * (float(in_w) / float(out_w)) - 0.5
    sy = (py.astype(jnp.float32) + 0.5) * (float(in_h) / float(out_h)) - 0.5

    cur = _sample_catrom_srgb(low_color, in_w, in_h, sx, sy)
    nmin = cur
    nmax = cur
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            c = _sample_catrom_srgb(
                low_color, in_w, in_h, sx + ox * 0.5, sy + oy * 0.5
            )
            nmin = jnp.minimum(nmin, c)
            nmax = jnp.maximum(nmax, c)

    # nearest low-res objId for disocclusion (RTTaa.cs:196-202)
    ix = _clampi(jnp.round(sx).astype(jnp.int32), 0, in_w - 1)
    iy = _clampi(jnp.round(sy).astype(jnp.int32), 0, in_h - 1)
    obj = jnp.take(
        low_obj_id,
        layout.position_from_xy(ix, iy, in_w, in_h),
        mode="clip",
    )

    hist = packing.unpack_srgb(history_color)
    reset = (~jnp.asarray(history_valid, bool)) | (history_obj_id != obj)
    hist_clamped = jnp.clip(hist, nmin, nmax)
    a = jnp.where(reset, 1.0, feedback)
    accum = hist_clamped * (1.0 - a)[..., None] + cur * a[..., None]

    sharpen = accum * (1.0 + 2.0 * sharpness) - (nmin + nmax) * (0.5 * sharpness)
    accum = accum * (1.0 - sharpness) + sharpen * sharpness

    out = packing.pack_srgb(accum)
    return out, out, obj
