"""Brute-force reference tracer: intersect-all-primitives, no BVH.

This is the test oracle the BVH traversal is validated against
(SURVEY.md section 4: "BVH traversal vs brute-force all-prims reference").
It replicates instance transforms (with the corrected 1:1 parametric-t
transfer, see traverse.py), sphere near/far selection, and the closest-hit
alpha-cutout rule. O(rays x prims) -- test-scale scenes only.
"""

from __future__ import annotations

import jax.numpy as jnp

from ilgpu_raytracing_tpu.models.scene import SceneData
from ilgpu_raytracing_tpu.ops import texture as tex_ops
from ilgpu_raytracing_tpu.ops.intersect import (
    T_EPS,
    T_INF,
    intersect_sphere,
    intersect_triangle,
)
from ilgpu_raytracing_tpu.ops.traverse import (
    KIND_SPHERE,
    KIND_TRI,
    HitRecord,
    _take,
    _tri_alpha_pass,
)
from ilgpu_raytracing_tpu.utils import vec


def trace_closest_brute(scene: SceneData, o: jnp.ndarray, d: jnp.ndarray) -> HitRecord:
    n = o.shape[0]
    best = HitRecord(
        t=jnp.full((n,), T_INF, jnp.float32),
        kind=jnp.zeros((n,), jnp.int32),
        prim=jnp.full((n,), -1, jnp.int32),
        inst=jnp.full((n,), -1, jnp.int32),
        bu=jnp.zeros((n,), jnp.float32),
        bv=jnp.zeros((n,), jnp.float32),
    )

    import numpy as np

    insts = np.asarray(scene.sph_instances).tolist() + np.asarray(
        scene.tri_instances
    ).tolist()
    kinds = [KIND_SPHERE] * scene.sph_instances.shape[0] + [
        KIND_TRI
    ] * scene.tri_instances.shape[0]

    for inst_id, kind in zip(insts, kinds):
        w2o = scene.inst_w2o[inst_id]
        o_obj = vec.transform_point(w2o, o)
        d_obj = vec.transform_vector(w2o, d)
        first = scene.inst_prim_first[inst_id]
        count = scene.inst_prim_count[inst_id]
        if kind == KIND_SPHERE:
            ok, t, _ = intersect_sphere(
                o_obj[:, None, :],
                d_obj[:, None, :],
                scene.sph_center[None, :, :],
                scene.sph_radius[None, :],
            )
            ids = jnp.arange(scene.sph_center.shape[0], dtype=jnp.int32)
            in_range = (ids >= first) & (ids < first + count)
            ok = ok & in_range[None, :]
            t = jnp.where(ok, t, T_INF)
            j = jnp.argmin(t, axis=1)
            t_obj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            t_world = t_obj  # parametric t transfers 1:1 (see traverse.py)
            better = (t_obj < T_INF) & (t_world < best.t)
            best = HitRecord(
                t=jnp.where(better, t_world, best.t),
                kind=jnp.where(better, KIND_SPHERE, best.kind),
                prim=jnp.where(better, j.astype(jnp.int32), best.prim),
                inst=jnp.where(better, inst_id, best.inst),
                bu=jnp.where(better, 0.0, best.bu),
                bv=jnp.where(better, 0.0, best.bv),
            )
        else:
            ok, t, bu, bv = intersect_triangle(
                o_obj[:, None, :],
                d_obj[:, None, :],
                scene.tri_v0[None, :, :],
                scene.tri_e1[None, :, :],
                scene.tri_e2[None, :, :],
            )
            ok = ok & (t > T_EPS)
            ids = jnp.arange(scene.tri_v0.shape[0], dtype=jnp.int32)
            in_range = (ids >= first) & (ids < first + count)
            ok = ok & in_range[None, :]
            if scene.has_alpha:
                T = scene.tri_v0.shape[0]
                prim_ids = jnp.broadcast_to(
                    jnp.arange(T, dtype=jnp.int32)[None, :], ok.shape
                )
                a_ok = _tri_alpha_pass(scene, prim_ids, bu, bv, closest=True)
                ok = ok & a_ok
            t = jnp.where(ok, t, T_INF)
            j = jnp.argmin(t, axis=1)
            pick = lambda arr: jnp.take_along_axis(arr, j[:, None], axis=1)[:, 0]
            t_obj = pick(t)
            t_world = t_obj  # parametric t transfers 1:1
            better = (t_obj < T_INF) & (t_world < best.t)
            best = HitRecord(
                t=jnp.where(better, t_world, best.t),
                kind=jnp.where(better, KIND_TRI, best.kind),
                prim=jnp.where(better, j.astype(jnp.int32), best.prim),
                inst=jnp.where(better, inst_id, best.inst),
                bu=jnp.where(better, pick(bu), best.bu),
                bv=jnp.where(better, pick(bv), best.bv),
            )
    return best


def shadow_occlusion_brute(scene: SceneData, o, d, t_max_world) -> jnp.ndarray:
    hit = trace_closest_brute(scene, o, d)
    return hit.hit & (hit.t < t_max_world)
