"""Vector math over `(..., 3)` float32 arrays.

The reference uses a scalar `Float3` value struct per GPU thread
(reference Float3.cs:6-114); the TPU-native equivalent is SoA batches where
every op is an elementwise VPU op over `(..., 3)` arrays. All functions
broadcast and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing axis -> (...)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length2(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length2(v))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """rsqrt-based normalize with epsilon floor (Float3.cs Normalize: rsqrt,
    eps 1e-20)."""
    inv = lax.rsqrt(jnp.maximum(eps, length2(v)))
    return v * inv[..., None]


def vec3(x, y, z, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([x, y, z], dtype=dtype)


def saturate(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(v, 0.0, 1.0)


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    return a * (1.0 - t) + b * t


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of incident dir `i` about normal `n`
    (RTRay.cs:561)."""
    return i - n * (2.0 * dot(i, n))[..., None]


def refract(i: jnp.ndarray, n: jnp.ndarray, eta_i, eta_t):
    """Snell refraction. Returns (ok_mask, refracted_dir); where total
    internal reflection occurs ok=False and dir is zeros
    (RTRay.cs:564-572 semantics)."""
    eta = jnp.asarray(eta_i / eta_t, dtype=i.dtype)
    cos_i = -dot(i, n)
    eta = jnp.broadcast_to(eta, cos_i.shape)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    ok = k >= 0.0
    k_safe = jnp.maximum(k, 0.0)
    t = i * eta[..., None] + n * (eta * cos_i - jnp.sqrt(k_safe))[..., None]
    t = normalize(t)
    return ok, jnp.where(ok[..., None], t, jnp.zeros_like(t))


def schlick_fresnel(cos, eta_i, eta_t) -> jnp.ndarray:
    """Schlick approximation of dielectric Fresnel reflectance
    (RTRay.cs:574-583)."""
    r0 = (eta_i - eta_t) / (eta_i + eta_t)
    r0 = r0 * r0
    omc = 1.0 - cos
    omc2 = omc * omc
    omc5 = omc2 * omc2 * omc
    return r0 + (1.0 - r0) * omc5


def orthonormal_basis(n: jnp.ndarray):
    """Tangent/bitangent frame around unit normal n (RTRay.cs:600-606)."""
    up_y = jnp.abs(n[..., 1]) < 0.999
    up = jnp.where(
        up_y[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    t = normalize(cross(up, n))
    b = cross(n, t)
    return t, b


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma (RTRay.cs:627)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def safe_color(c: jnp.ndarray, max_abs: float = 1e6) -> jnp.ndarray:
    """NaN/Inf scrub + clamp to +-max_abs (RTRay.cs:645-655). In the pure
    functional pipeline this is the same numeric-safety net the reference
    applies per sample."""
    c = jnp.nan_to_num(c, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.clip(c, -max_abs, max_abs)


def inv_dir(d: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal ray direction with zero-guard (RTRay.cs:548-549)."""
    safe = jnp.where(d != 0.0, d, 1e-8)
    return 1.0 / safe


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply row-major 3x4 affine `m` (shape (..., 3, 4)) to points
    (SceneDeviceViews.cs:484-487 semantics)."""
    return (
        jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    )


def transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the linear part of a 3x4 affine to vectors
    (SceneDeviceViews.cs:489-493)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)
