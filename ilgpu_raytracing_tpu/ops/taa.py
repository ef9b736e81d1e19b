"""TAAU: temporal AA + upsample resolve (reference RTTaa.cs).

Pure function over packed uint32 color buffers: maps each output pixel to
low-res coords, reconstructs with the reference's smoothstep-weighted
"CatRom" taps in linearized sRGB (RTTaa.cs:204-229), builds a 3x3
neighborhood min/max from +-0.5-texel taps (:133-144), resets history on
objId disocclusion (:147-154), clamps history to the neighborhood, blends
with feedback, applies a light unsharp mask, and returns both the output and
the new history (the reference writes history in place, :168-170; here it
ping-pongs through the return value).

TPU restructure (same math, different evaluation order): the reference
gathers + linearizes 4 texels per tap per output pixel (36 flat gathers and
36 sRGB decodes per frame at 2M output pixels). Here the low-res buffer is
converted to a linear-light image ONCE, and every tap becomes two
*separable* axis gathers (`take` along rows / columns with per-axis index
vectors baked at trace time) -- the tap coordinates depend only on the
output x (columns) and output y (rows) respectively, never on both. The
blend weights and clamped tap indices are identical to the per-pixel
formulation, so results match the naive evaluation to f32 rounding.

No motion vectors (motionScale=0 in the reference, :82-84).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.utils import packing


def _axis_taps(out_size: int, in_size: int, offset: float):
    """Per-axis tap indices + smoothstep weight for one sample offset.

    Mirrors the per-pixel math of RTTaa.cs:206-229 in float32: coordinate
    s = (p+0.5)*in/out - 0.5 + offset, i1 = clamp(floor(s)), i2 = min(i1+1),
    f = s - i1 (post-clamp), tt = f*(2-f).
    """
    p = np.arange(out_size, dtype=np.float32)
    ratio = np.float32(float(in_size) / float(out_size))
    s = (p + np.float32(0.5)) * ratio - np.float32(0.5)
    if offset:
        s = s + np.float32(offset)
    i1 = np.clip(np.floor(s).astype(np.int32), 0, in_size - 1)
    i2 = np.minimum(i1 + 1, in_size - 1)
    f = s - i1.astype(np.float32)
    tt = f * (np.float32(2.0) - f)
    return jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(tt)


def _nearest_taps(out_size: int, in_size: int):
    """Nearest low-res index per output index (RTTaa.cs:196-202)."""
    p = np.arange(out_size, dtype=np.float32)
    ratio = np.float32(float(in_size) / float(out_size))
    s = (p + np.float32(0.5)) * ratio - np.float32(0.5)
    return jnp.asarray(
        np.clip(np.round(s).astype(np.int32), 0, in_size - 1)
    )


def _sample_x(img, out_w: int, offset: float):
    """(in_h, in_w, 3) -> (in_h, out_w, 3) smoothstep blend along x."""
    in_w = img.shape[1]
    x1, x2, ttx = _axis_taps(out_w, in_w, offset)
    a = jnp.take(img, x1, axis=1)
    b = jnp.take(img, x2, axis=1)
    w = ttx[None, :, None]
    return a * (1.0 - w) + b * w


def _sample_y(img, out_h: int, offset: float):
    """(in_h, W, 3) -> (out_h, W, 3) smoothstep blend along y."""
    in_h = img.shape[0]
    y1, y2, tty = _axis_taps(out_h, in_h, offset)
    a = jnp.take(img, y1, axis=0)
    b = jnp.take(img, y2, axis=0)
    w = tty[:, None, None]
    return a * (1.0 - w) + b * w


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
    # linearize the low-res frame once (block-linear -> image is a pure
    # reshape/transpose, ops/layout.py)
    low_img = packing.unpack_srgb(layout.to_image(low_color, in_w, in_h))

    # 3 x-offsets x 3 y-offsets = the center tap + 8 neighborhood taps
    tx = {ox: _sample_x(low_img, out_w, ox * 0.5) for ox in (-1, 0, 1)}
    cur = _sample_y(tx[0], out_h, 0.0)
    nmin = cur
    nmax = cur
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            c = _sample_y(tx[ox], out_h, oy * 0.5)
            nmin = jnp.minimum(nmin, c)
            nmax = jnp.maximum(nmax, c)

    # nearest low-res objId for disocclusion (RTTaa.cs:196-202)
    obj_img = layout.to_image(low_obj_id, in_w, in_h)
    obj = jnp.take(
        jnp.take(obj_img, _nearest_taps(out_h, in_h), axis=0),
        _nearest_taps(out_w, in_w),
        axis=1,
    )

    # history blend at output res (row-major flat buffers)
    flat = lambda x: x.reshape(out_h * out_w, *x.shape[3:])
    cur = cur.reshape(-1, 3)
    nmin = nmin.reshape(-1, 3)
    nmax = nmax.reshape(-1, 3)
    obj = obj.reshape(-1)

    hist = packing.unpack_srgb(history_color)
    reset = (~jnp.asarray(history_valid, bool)) | (history_obj_id != obj)
    hist_clamped = jnp.clip(hist, nmin, nmax)
    a = jnp.where(reset, 1.0, feedback)
    accum = hist_clamped * (1.0 - a)[..., None] + cur * a[..., None]

    sharpen = accum * (1.0 + 2.0 * sharpness) - (nmin + nmax) * (0.5 * sharpness)
    accum = accum * (1.0 - sharpness) + sharpen * sharpness

    out = packing.pack_srgb(accum)
    return out, out, obj
