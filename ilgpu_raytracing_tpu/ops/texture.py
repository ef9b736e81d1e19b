"""Texture sampling from the flat texel pool (gather ops).

Semantics track the reference's manual samplers exactly, including the V
flip, the (w-1)/(h-1) footprint, wrap-by-fraction addressing, and the luma
alpha-mask read (reference SceneDeviceViews.cs:329-472).

Texels are uint32 0xAARRGGBB. All functions take per-lane texture ids and
gather TexInfo; id < 0 or empty textures return white / alpha 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from ilgpu_raytracing_tpu.models.scene import SceneData

_U = jnp.uint32


def _texinfo(scene: SceneData, tex_id):
    safe = jnp.clip(tex_id, 0, scene.tex_offset.shape[0] - 1)
    off = jnp.take(scene.tex_offset, safe)
    w = jnp.take(scene.tex_width, safe)
    h = jnp.take(scene.tex_height, safe)
    valid = (tex_id >= 0) & (tex_id < scene.tex_offset.shape[0]) & (w > 0) & (h > 0)
    return off, w, h, valid


def _texel(scene: SceneData, off, w, h, x, y):
    """Clamped texel fetch (SceneDeviceViews.cs:330-339). Returns uint32."""
    sx = jnp.clip(x, 0, jnp.maximum(w - 1, 0))
    sy = jnp.clip(y, 0, jnp.maximum(h - 1, 0))
    idx = off + sy * w + sx
    idx = jnp.clip(idx, 0, scene.texels.shape[0] - 1)
    return jnp.take(scene.texels, idx)


def _rgb(p):
    p = p.astype(jnp.uint32)
    r = ((p >> _U(16)) & _U(255)).astype(jnp.float32)
    g = ((p >> _U(8)) & _U(255)).astype(jnp.float32)
    b = (p & _U(255)).astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) * jnp.float32(1.0 / 255.0)


def _luma01(p):
    c = _rgb(p)
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _bilinear_setup(u, v, w, h):
    """Shared addressing: wrap by fraction, V flip, (dim-1) footprint
    (SceneDeviceViews.cs:360-375)."""
    fu = u - jnp.floor(u)
    fv = 1.0 - (v - jnp.floor(v))
    x = fu * (w - 1).astype(jnp.float32)
    y = fv * (h - 1).astype(jnp.float32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(w - 1, x0 + 1)
    y1 = jnp.minimum(h - 1, y0 + 1)
    tx = x - x0.astype(jnp.float32)
    ty = y - y0.astype(jnp.float32)
    return x0, y0, x1, y1, tx, ty


def sample_texture_bilinear(scene: SceneData, tex_id, u, v):
    """Bilinear RGB; invalid ids -> white (SceneDeviceViews.cs:358-385)."""
    off, w, h, valid = _texinfo(scene, tex_id)
    x0, y0, x1, y1, tx, ty = _bilinear_setup(u, v, w, h)
    c00 = _rgb(_texel(scene, off, w, h, x0, y0))
    c10 = _rgb(_texel(scene, off, w, h, x1, y0))
    c01 = _rgb(_texel(scene, off, w, h, x0, y1))
    c11 = _rgb(_texel(scene, off, w, h, x1, y1))
    cx0 = c00 * (1.0 - tx)[..., None] + c10 * tx[..., None]
    cx1 = c01 * (1.0 - tx)[..., None] + c11 * tx[..., None]
    c = cx0 * (1.0 - ty)[..., None] + cx1 * ty[..., None]
    return jnp.where(valid[..., None], c, 1.0)


def sample_mask_bilinear(scene: SceneData, tex_id, u, v):
    """Bilinear alpha mask from luma; invalid -> 1
    (SceneDeviceViews.cs:387-415)."""
    off, w, h, valid = _texinfo(scene, tex_id)
    x0, y0, x1, y1, tx, ty = _bilinear_setup(u, v, w, h)
    a00 = _luma01(_texel(scene, off, w, h, x0, y0))
    a10 = _luma01(_texel(scene, off, w, h, x1, y0))
    a01 = _luma01(_texel(scene, off, w, h, x0, y1))
    a11 = _luma01(_texel(scene, off, w, h, x1, y1))
    ax0 = a00 * (1.0 - tx) + a10 * tx
    ax1 = a01 * (1.0 - tx) + a11 * tx
    a = ax0 * (1.0 - ty) + ax1 * ty
    return jnp.where(valid, a, 1.0)


def sample_mask_point(scene: SceneData, tex_id, u, v):
    """Point-sampled alpha mask (SceneDeviceViews.cs:417-428)."""
    off, w, h, valid = _texinfo(scene, tex_id)
    fu = u - jnp.floor(u)
    fv = 1.0 - (v - jnp.floor(v))
    x = jnp.round(fu * (w - 1).astype(jnp.float32)).astype(jnp.int32)
    y = jnp.round(fv * (h - 1).astype(jnp.float32)).astype(jnp.int32)
    a = _luma01(_texel(scene, off, w, h, x, y))
    return jnp.where(valid, a, 1.0)
