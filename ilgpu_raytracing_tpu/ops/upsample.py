"""Blit / bilinear upsample of packed color (non-TAAU present path,
reference RTRenderer.cs:281-320).

Evaluated separably (take along columns, then rows, with index/weight
vectors baked at trace time) -- the tap coordinates depend only on the
output x and output y respectively. Same math as the per-pixel
formulation, restructured for TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.utils import packing


def _axis_taps(out_size: int, in_size: int):
    """i0/i1/weight per output index (RTRenderer.cs:287-320 bilinear)."""
    p = np.arange(out_size, dtype=np.float32)
    ratio = np.float32(float(in_size) / float(out_size))
    s = (p + np.float32(0.5)) * ratio - np.float32(0.5)
    i0 = np.clip(np.floor(s).astype(np.int32), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    t = np.clip(s - i0.astype(np.float32), 0.0, 1.0)
    return jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(t)


@partial(jax.jit, static_argnames=("src_w", "src_h", "dst_w", "dst_h"))
def bilinear_upsample(src_packed, src_w: int, src_h: int, dst_w: int, dst_h: int):
    if (src_w, src_h) == (dst_w, dst_h):
        # block-linear src -> row-major presented frame (pure transpose)
        return layout.to_image(src_packed, src_w, src_h).reshape(-1)
    img = packing.unpack_rgb8(layout.to_image(src_packed, src_w, src_h))
    x0, x1, tx = _axis_taps(dst_w, src_w)
    y0, y1, ty = _axis_taps(dst_h, src_h)
    a = jnp.take(img, x0, axis=1)
    b = jnp.take(img, x1, axis=1)
    w = tx[None, :, None]
    cx = a * (1.0 - w) + b * w
    a = jnp.take(cx, y0, axis=0)
    b = jnp.take(cx, y1, axis=0)
    w = ty[:, None, None]
    return packing.pack_rgba8((a * (1.0 - w) + b * w).reshape(-1, 3))
