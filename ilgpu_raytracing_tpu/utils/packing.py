"""Color / material packing helpers.

Packed colors are uint32 `0xAARRGGBB`, matching the reference's RGBA8 layout
(GpuFramebuffer.PackRGBA8, reference RTRay.cs:66-76) but using an unsigned
dtype so high-bit alpha needs no sign tricks. sRGB conversion matches the
TAA path's exact piecewise curves (RTTaa.cs:231-258).
"""

from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def _to_byte(x: jnp.ndarray) -> jnp.ndarray:
    """saturate then scale by 255.99 and truncate (RTRay.cs:71-76)."""
    c = jnp.clip(x, 0.0, 1.0)
    return (255.99 * c).astype(jnp.uint32)


def pack_rgba8(c: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) linear-clamped color -> uint32 0xAARRGGBB (alpha=255)."""
    r = _to_byte(c[..., 0])
    g = _to_byte(c[..., 1])
    b = _to_byte(c[..., 2])
    return (_U(0xFF) << _U(24)) | (r << _U(16)) | (g << _U(8)) | b


def unpack_rgb8(p: jnp.ndarray) -> jnp.ndarray:
    """uint32 0xAARRGGBB -> (..., 3) floats in [0,1] (RTRenderer.cs:322-329)."""
    p = p.astype(jnp.uint32)
    r = ((p >> _U(16)) & _U(255)).astype(jnp.float32)
    g = ((p >> _U(8)) & _U(255)).astype(jnp.float32)
    b = (p & _U(255)).astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) * jnp.float32(1.0 / 255.0)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise sRGB EOTF (RTTaa.cs:236-240)."""
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4)
    )


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise sRGB OETF (RTTaa.cs:250-253)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )


def pack_srgb(c_linear: jnp.ndarray) -> jnp.ndarray:
    """Linear (..., 3) -> sRGB-encoded uint32 0xAARRGGBB with round-to-nearest
    (RTTaa.cs:245-258)."""
    s = linear_to_srgb(c_linear)
    b = jnp.round(jnp.clip(s, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return (
        (_U(0xFF) << _U(24))
        | (b[..., 0] << _U(16))
        | (b[..., 1] << _U(8))
        | b[..., 2]
    )


def unpack_srgb(p: jnp.ndarray) -> jnp.ndarray:
    """uint32 0xAARRGGBB (sRGB-encoded) -> linear (..., 3) (RTTaa.cs:232-242)."""
    return srgb_to_linear(unpack_rgb8(p))


# --- packed material id: shading mode in low 16 bits, IOR quantized to
#     i16 (x1000) in high 16 bits (RTRay.cs:199, 608-615) ---


def pack_mat_id(shade: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    q = jnp.clip(ior * 1000.0, 0.0, 65535.0).astype(jnp.int32)
    return (shade.astype(jnp.int32) & 0xFFFF) | (q << 16)


def unpack_mat_id(packed: jnp.ndarray):
    shade = packed & 0xFFFF
    ior = ((packed >> 16) & 0xFFFF).astype(jnp.float32) / 1000.0
    return shade, ior
