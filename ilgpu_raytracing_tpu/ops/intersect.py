"""Intersection primitives, vectorized over ray lanes.

Each function broadcasts over leading dims (typically a flat ray batch) and
returns mask + parameters instead of branching -- branchless VPU code, the
TPU equivalent of the reference's scalar device helpers
(reference SceneDeviceViews.cs:495-558).
"""

from __future__ import annotations

import jax.numpy as jnp

from ilgpu_raytracing_tpu.utils import vec

T_EPS = 0.001  # reference's pervasive t lower bound
T_INF = 1e30
T_HIT_MAX = 1e29  # "did we hit" threshold (SceneDeviceViews.cs:85)


def intersect_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    """Slab test (SceneDeviceViews.cs:495-514). Returns bool mask.

    o, inv_d: (..., 3); bmin/bmax: (..., 3); t_min/t_max scalar or (...).
    """
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    tlo = jnp.minimum(t1, t2)
    thi = jnp.maximum(t1, t2)
    tmin = jnp.max(tlo, axis=-1)
    tmax = jnp.min(thi, axis=-1)
    return (tmax >= jnp.maximum(tmin, t_min)) & (tmin <= t_max)


def intersect_sphere(o, d, center, radius):
    """Quadratic sphere test (SceneDeviceViews.cs:516-537).

    Returns (ok, t, n) with the reference's near-then-far t selection above
    T_EPS; n is the geometric normal at the hit (outward).
    """
    oc = o - center
    a = vec.dot(d, d)
    b = 2.0 * vec.dot(oc, d)
    c = vec.dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    ok_disc = disc >= 0.0
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_2a = 1.0 / (2.0 * a)
    t0 = (-b - sqrt_d) * inv_2a
    t1 = (-b + sqrt_d) * inv_2a
    t = jnp.where(t0 >= T_EPS, t0, t1)
    ok = ok_disc & (t >= T_EPS)
    t = jnp.where(ok, t, 0.0)
    p = o + d * t[..., None]
    n = vec.normalize(p - center)
    n = jnp.where(ok[..., None], n, 0.0)
    return ok, t, n


def intersect_triangle(o, d, v0, e1, e2):
    """Moller-Trumbore with precomputed edges (SceneDeviceViews.cs:539-558).

    Returns (ok, t, bu, bv). The geometric normal is cross(e1, e2) --
    computed by the caller only for the accepted hit (deferred shading).
    """
    p = vec.cross(d, e2)
    det = vec.dot(e1, p)
    ok = jnp.abs(det) >= 1e-8
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tv = o - v0
    bu = vec.dot(tv, p) * inv_det
    ok = ok & (bu >= 0.0) & (bu <= 1.0)
    q = vec.cross(tv, e1)
    bv = vec.dot(d, q) * inv_det
    ok = ok & (bv >= 0.0) & (bu + bv <= 1.0)
    t = vec.dot(e2, q) * inv_det
    ok = ok & (t > 0.0)
    z = jnp.zeros_like(t)
    return ok, jnp.where(ok, t, z), jnp.where(ok, bu, z), jnp.where(ok, bv, z)
