"""Ray traversal over the two-level BVH (TPU-native SIMT style).

Execution model redesign vs the reference: the reference walks
TLAS -> per-leaf instances -> BLAS in nested scalar loops per CUDA thread
(reference SceneDeviceViews.cs:30-121). Here every ray in a flat SoA batch
advances one BVH node per `lax.while_loop` step, carrying a per-lane `cur`
node pointer; the loop runs until all lanes have walked off the tree
(cur == -1). Instances are iterated with `lax.scan` (two static passes:
sphere-set instances, then tri-mesh instances) with a per-instance world-AABB
early-out mask, so the inner while_loop is shared by all lanes and node data
is fetched with batched gathers.

The skip-index walk itself is the reference's contract exactly:
next = hit ? (leaf ? skip-after-prims : left) : skip
(SceneDeviceViews.cs:33-85). Leaf prims are processed with a static unroll of
`blas_leaf_max` masked lanes.

Deliberate fix vs the reference: the reference converts object-space hits
with t_world = t_obj / uniformScale (SceneDeviceViews.cs:67) and shadow
limits with t_max_obj = t_max_world * scale (:107). That conversion is
geometrically wrong: rays are transformed with the UNNORMALIZED linear part
(TransformRay, SceneDeviceViews.cs:475-481), so o2w(o_obj + d_obj*t) ==
o + d*t exactly and the parametric t transfers 1:1 between spaces. The
reference only gets away with it because its single scaled instance (Sponza
at 0.01) rarely loses a depth contest. Here t_obj == t_world everywhere,
which also makes world-unit AABB pruning across instances exact.

Traversal is *deferred-shading*: it returns compact hit records
(t, kind, prim, inst, bary) and a separate `shade_hits` stage gathers
normals/albedo/material once per ray instead of per candidate (the reference
samples textures inside the traversal loop for every accepted candidate,
SceneDeviceViews.cs:208-218). Alpha-cutout still happens inside traversal
when the scene has alpha maps (it affects visibility).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ilgpu_raytracing_tpu.models.scene import SceneData
from ilgpu_raytracing_tpu.ops import texture as tex_ops
from ilgpu_raytracing_tpu.ops.intersect import (
    T_EPS,
    T_HIT_MAX,
    T_INF,
    intersect_aabb,
    intersect_sphere,
    intersect_triangle,
)
from ilgpu_raytracing_tpu.utils import vec

KIND_MISS = 0
KIND_SPHERE = 1
KIND_TRI = 2


@struct.dataclass
class HitRecord:
    t: jnp.ndarray  # (N,) world-space t, T_INF on miss
    kind: jnp.ndarray  # (N,) i32
    prim: jnp.ndarray  # (N,) i32: sphere id or global tri id
    inst: jnp.ndarray  # (N,) i32: combined instance index
    bu: jnp.ndarray  # (N,)
    bv: jnp.ndarray  # (N,)

    @property
    def hit(self) -> jnp.ndarray:
        return self.t < T_HIT_MAX


def _take(arr, idx):
    return jnp.take(arr, idx, axis=0, mode="clip")


def _gather_node(scene_bmin, scene_bmax, scene_ifields, cur):
    safe = jnp.maximum(cur, 0)
    bmin = _take(scene_bmin, safe)
    bmax = _take(scene_bmax, safe)
    ifld = _take(scene_ifields, safe)
    return bmin, bmax, ifld[..., 0], ifld[..., 1], ifld[..., 2], ifld[..., 3]


def _tri_alpha_pass(scene: SceneData, prim, bu, bv, closest: bool):
    """Alpha-cutout acceptance for a candidate triangle hit.

    closest=True: bilinear mask vs cutoff (SceneDeviceViews.cs:209-218).
    closest=False (any-hit): +-0.10 point-sample band, bilinear only decides
    inside the band (SceneDeviceViews.cs:297-315).
    Returns accept mask (True = surface is opaque here).
    """
    mat = _take(scene.tri_mat, prim)
    atex = _take(scene.mat_alpha_tex, mat)
    cutoff = _take(scene.mat_alpha_cutoff, mat)
    has_map = atex >= 0
    w = 1.0 - bu - bv
    uv0 = _take(scene.tri_uv0, prim)
    uv1 = _take(scene.tri_uv1, prim)
    uv2 = _take(scene.tri_uv2, prim)
    uu = uv0[..., 0] * w + uv1[..., 0] * bu + uv2[..., 0] * bv
    vv = uv0[..., 1] * w + uv1[..., 1] * bu + uv2[..., 1] * bv
    if closest:
        a = tex_ops.sample_mask_bilinear(scene, atex, uu, vv)
        return jnp.where(has_map, a >= cutoff, True)
    band = 0.10
    a_pt = tex_ops.sample_mask_point(scene, atex, uu, vv)
    sure_reject = a_pt < cutoff - band
    sure_accept = a_pt >= cutoff + band
    a_lin = tex_ops.sample_mask_bilinear(scene, atex, uu, vv)
    in_band = (~sure_reject) & (~sure_accept)
    ok = sure_accept | (in_band & (a_lin >= cutoff))
    return jnp.where(has_map, ok, True)


def _blas_walk(scene: SceneData, o_obj, d_obj, start_cur, t_max0, kind: int,
               any_hit: bool):
    """Shared BLAS skip-index walk for one instance over all ray lanes.

    kind: KIND_SPHERE / KIND_TRI selects the leaf primitive test (static).
    any_hit=False -> returns (t_obj, prim, bu, bv): closest hit in object
      space (t_obj == T_INF when none), pruned against t_max0.
    any_hit=True  -> returns occluded mask: any accepted hit < t_max0.
    """
    inv_obj = vec.inv_dir(d_obj)
    n = o_obj.shape[0]
    leaf_max = scene.blas_leaf_max

    def leaf_test(slot, t_limit):
        """Intersect the prim in indirection slot `slot`; returns
        (ok, t, bu, bv) -- bu/bv zero for spheres."""
        if kind == KIND_SPHERE:
            prim = _take(scene.sphere_prim_idx, slot)
            c = _take(scene.sph_center, prim)
            r = _take(scene.sph_radius, prim)
            ok, t, _n = intersect_sphere(o_obj, d_obj, c, r)
            z = jnp.zeros_like(t)
            return prim, ok, t, z, z
        prim = _take(scene.tri_prim_idx, slot)
        v0 = _take(scene.tri_v0, prim)
        e1 = _take(scene.tri_e1, prim)
        e2 = _take(scene.tri_e2, prim)
        ok, t, bu, bv = intersect_triangle(o_obj, d_obj, v0, e1, e2)
        ok = ok & (t > T_EPS)
        if scene.has_alpha and kind == KIND_TRI:
            cand = ok & (t < t_limit)
            alpha_ok = _tri_alpha_pass(scene, prim, bu, bv, closest=not any_hit)
            ok = cand & alpha_ok
        return prim, ok, t, bu, bv

    if any_hit:
        init = (start_cur, jnp.zeros((n,), dtype=bool))

        def cond(state):
            cur, _ = state
            return jnp.any(cur >= 0)

        def body(state):
            cur, occ = state
            active = cur >= 0
            bmin, bmax, left, first, count, skip = _gather_node(
                scene.blas_bmin, scene.blas_bmax, scene.blas_ifields, cur
            )
            hit_box = active & intersect_aabb(o_obj, inv_obj, bmin, bmax, T_EPS, t_max0)
            is_leaf = count > 0
            occ_new = occ
            for i in range(leaf_max):
                valid = hit_box & is_leaf & (i < count) & (~occ_new)
                slot = first + i
                _prim, ok, t, _bu, _bv = leaf_test(slot, t_max0)
                occ_new = occ_new | (valid & ok & (t > T_EPS) & (t < t_max0))
            nxt = jnp.where(hit_box, jnp.where(is_leaf, skip, left), skip)
            nxt = jnp.where(active & (~occ_new), nxt, -1)
            return nxt, occ_new

        _, occluded = lax.while_loop(cond, body, init)
        return occluded

    t_best0 = jnp.minimum(jnp.full((n,), T_INF, dtype=jnp.float32), t_max0)
    init = (
        start_cur,
        t_best0,
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.zeros((n,), dtype=jnp.float32),
        jnp.zeros((n,), dtype=jnp.float32),
    )

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        cur, t_best, prim_best, bu_best, bv_best = state
        active = cur >= 0
        bmin, bmax, left, first, count, skip = _gather_node(
            scene.blas_bmin, scene.blas_bmax, scene.blas_ifields, cur
        )
        hit_box = active & intersect_aabb(o_obj, inv_obj, bmin, bmax, T_EPS, t_best)
        is_leaf = count > 0
        for i in range(leaf_max):
            valid = hit_box & is_leaf & (i < count)
            slot = first + i
            prim, ok, t, bu, bv = leaf_test(slot, t_best)
            accept = valid & ok & (t > T_EPS) & (t < t_best)
            t_best = jnp.where(accept, t, t_best)
            prim_best = jnp.where(accept, prim, prim_best)
            bu_best = jnp.where(accept, bu, bu_best)
            bv_best = jnp.where(accept, bv, bv_best)
        nxt = jnp.where(hit_box, jnp.where(is_leaf, skip, left), skip)
        nxt = jnp.where(active, nxt, -1)
        return nxt, t_best, prim_best, bu_best, bv_best

    _, t_obj, prim, bu, bv = lax.while_loop(cond, body, init)
    # lanes that only hit the seeded prune limit are misses
    t_obj = jnp.where(prim >= 0, t_obj, T_INF)
    return t_obj, prim, bu, bv


def _instance_xs(scene: SceneData, inst_ids: jnp.ndarray):
    return dict(
        inst=inst_ids,
        w2o=_take(scene.inst_w2o, inst_ids),
        scale=_take(scene.inst_scale, inst_ids),
        bmin=_take(scene.inst_bmin, inst_ids),
        bmax=_take(scene.inst_bmax, inst_ids),
        root=_take(scene.inst_blas_root, inst_ids),
    )


def trace_closest(
    scene: SceneData, o: jnp.ndarray, d: jnp.ndarray, active=None
) -> HitRecord:
    """Closest-hit world trace (deferred shading).

    o, d: (N,3) world rays; `active` optionally masks lanes off (they return
    miss and cost no traversal steps). Returns HitRecord.
    """
    n = o.shape[0]
    inv_d = vec.inv_dir(d)
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    best = HitRecord(
        t=jnp.full((n,), T_INF, dtype=jnp.float32),
        kind=jnp.zeros((n,), dtype=jnp.int32),
        prim=jnp.full((n,), -1, dtype=jnp.int32),
        inst=jnp.full((n,), -1, dtype=jnp.int32),
        bu=jnp.zeros((n,), dtype=jnp.float32),
        bv=jnp.zeros((n,), dtype=jnp.float32),
    )

    def pass_over(best: HitRecord, inst_ids: jnp.ndarray, kind: int) -> HitRecord:
        if inst_ids.shape[0] == 0:
            return best
        xs = _instance_xs(scene, inst_ids)

        def step(carry: HitRecord, x):
            enter = active & intersect_aabb(
                o, inv_d, x["bmin"], x["bmax"], T_EPS, carry.t
            )
            o_obj = vec.transform_point(x["w2o"], o)
            d_obj = vec.transform_vector(x["w2o"], d)
            start = jnp.where(enter, x["root"], -1).astype(jnp.int32)
            t_max_obj = jnp.where(enter, carry.t, 0.0)  # t transfers 1:1
            t_obj, prim, bu, bv = _blas_walk(
                scene, o_obj, d_obj, start, t_max_obj, kind, any_hit=False
            )
            t_world = t_obj
            better = (t_obj < T_HIT_MAX) & (t_world < carry.t)
            new = HitRecord(
                t=jnp.where(better, t_world, carry.t),
                kind=jnp.where(better, kind, carry.kind),
                prim=jnp.where(better, prim, carry.prim),
                inst=jnp.where(better, x["inst"], carry.inst),
                bu=jnp.where(better, bu, carry.bu),
                bv=jnp.where(better, bv, carry.bv),
            )
            return new, None

        best, _ = lax.scan(step, best, xs)
        return best

    best = pass_over(best, scene.sph_instances, KIND_SPHERE)
    best = pass_over(best, scene.tri_instances, KIND_TRI)
    return best


def shadow_occlusion(scene: SceneData, o: jnp.ndarray, d: jnp.ndarray,
                     t_max_world, active=None) -> jnp.ndarray:
    """Any-hit occlusion (SceneDeviceViews.cs:88-121). Returns bool (N,)."""
    n = o.shape[0]
    inv_d = vec.inv_dir(d)
    t_max_world = jnp.broadcast_to(jnp.asarray(t_max_world, jnp.float32), (n,))
    occluded = jnp.zeros((n,), dtype=bool)
    if active is None:
        active = jnp.ones((n,), dtype=bool)

    def pass_over(occluded, inst_ids, kind: int):
        if inst_ids.shape[0] == 0:
            return occluded
        xs = _instance_xs(scene, inst_ids)

        def step(occ, x):
            enter = active & (~occ) & intersect_aabb(
                o, inv_d, x["bmin"], x["bmax"], T_EPS, t_max_world
            )
            o_obj = vec.transform_point(x["w2o"], o)
            d_obj = vec.transform_vector(x["w2o"], d)
            start = jnp.where(enter, x["root"], -1).astype(jnp.int32)
            t_max_obj = t_max_world  # parametric t transfers 1:1
            blocked = _blas_walk(
                scene, o_obj, d_obj, start, t_max_obj, kind, any_hit=True
            )
            return occ | blocked, None

        occluded, _ = lax.scan(step, occluded, xs)
        return occluded

    occluded = pass_over(occluded, scene.sph_instances, KIND_SPHERE)
    occluded = pass_over(occluded, scene.tri_instances, KIND_TRI)
    return occluded


# ---------------- deferred hit shading ----------------


@struct.dataclass
class Surface:
    pos: jnp.ndarray  # (N,3) world hit position
    normal: jnp.ndarray  # (N,3) world shading normal
    albedo: jnp.ndarray  # (N,3)
    shading: jnp.ndarray  # (N,) i32 (lambert/mirror/glass)
    ior: jnp.ndarray  # (N,)
    obj_id: jnp.ndarray  # (N,) i32 disocclusion key: tri id or -1 (quirk kept)


def _shade_tables(scene: SceneData):
    """Per-prim attribute rows so shading costs ONE gather per prim class
    instead of ~15 (gathers are latency-bound on TPU: each (N,) gather at
    901k lanes costs 1.5-6 ms regardless of width; packed (N,k) rows
    amortize it). Material fields fold per prim at build; the tables are
    tiny (n_prims x ~20 f32) and XLA hoists their construction out of the
    per-frame graph as a constant-like subexpression.

    tri row (20): e1 e2 kd dtex two_sided shading ior uv0 uv1 uv2
    sph row (12): center radius base_albedo(kd-or-sphere-color) dtex
                  shading ior
    inst row (24): w2o(12) o2w(12)
    """
    mkd = scene.mat_kd
    tmat = scene.tri_mat
    t_kd = jnp.take(mkd, tmat, axis=0, mode="clip")
    tri = jnp.concatenate(
        [
            scene.tri_e1,
            scene.tri_e2,
            t_kd,
            jnp.take(scene.mat_diffuse_tex, tmat, mode="clip")
            .astype(jnp.float32)[:, None],
            jnp.take(scene.mat_two_sided, tmat, mode="clip")
            .astype(jnp.float32)[:, None],
            jnp.take(scene.mat_shading, tmat, mode="clip")
            .astype(jnp.float32)[:, None],
            jnp.take(scene.mat_ior, tmat, mode="clip")[:, None],
            scene.tri_uv0,
            scene.tri_uv1,
            scene.tri_uv2,
        ],
        axis=1,
    )
    smat = scene.sph_mat
    s_kd = jnp.take(mkd, smat, axis=0, mode="clip")
    kd_zero = jnp.all(s_kd == 0.0, axis=-1)
    s_base = jnp.where(kd_zero[..., None], scene.sph_albedo, s_kd)
    sph = jnp.concatenate(
        [
            scene.sph_center,
            scene.sph_radius[:, None],
            s_base,
            jnp.take(scene.mat_diffuse_tex, smat, mode="clip")
            .astype(jnp.float32)[:, None],
            scene.sph_shading.astype(jnp.float32)[:, None],
            scene.sph_ior[:, None],
        ],
        axis=1,
    )
    inst = jnp.concatenate(
        [
            scene.inst_w2o.reshape(scene.inst_w2o.shape[0], -1),
            scene.inst_o2w.reshape(scene.inst_o2w.shape[0], -1),
        ],
        axis=1,
    )
    return tri, sph, inst


def shade_hits(scene: SceneData, hit: HitRecord, o: jnp.ndarray,
               d: jnp.ndarray) -> Surface:
    """Resolve hit records to surface attributes (one gather pass per batch).

    Matches the reference's per-hit attribute rules: sphere albedo prefers
    material Kd unless zero, spherical-UV diffuse texture
    (SceneDeviceViews.cs:146-158); triangles use Kd or bilinear diffuse map,
    two-sided normal flip (SceneDeviceViews.cs:208-222). The disocclusion key
    keeps the reference quirk: global tri index for meshes, -1 for spheres
    (SURVEY.md known-quirks).
    """
    n = o.shape[0]
    is_sph = hit.kind == KIND_SPHERE
    is_tri = hit.kind == KIND_TRI
    prim = jnp.maximum(hit.prim, 0)
    inst = jnp.maximum(hit.inst, 0)

    tri_tab, sph_tab, inst_tab = _shade_tables(scene)
    trow = jnp.take(tri_tab, prim, axis=0, mode="clip")
    srow = jnp.take(sph_tab, prim, axis=0, mode="clip")
    irow = jnp.take(inst_tab, inst, axis=0, mode="clip")

    pos_w = o + d * hit.t[..., None]
    w2o = irow[:, 0:12].reshape(n, 3, 4)
    o2w = irow[:, 12:24].reshape(n, 3, 4)
    d_obj = vec.transform_vector(w2o, d)

    # --- sphere attributes ---
    c = srow[:, 0:3]
    p_obj = vec.transform_point(w2o, pos_w)
    n_sph_obj = vec.normalize(p_obj - c)
    sph_base = srow[:, 4:7]
    sph_dtex = srow[:, 7].astype(jnp.int32)
    # spherical UV from the object-space normal (SceneDeviceViews.cs:149-156)
    su = 0.5 + jnp.arctan2(n_sph_obj[..., 2], n_sph_obj[..., 0]) / (2.0 * jnp.pi)
    sv = jnp.arccos(jnp.clip(n_sph_obj[..., 1], -1.0, 1.0)) / jnp.pi
    sph_texc = tex_ops.sample_texture_bilinear(scene, sph_dtex, su, sv)
    sph_albedo = jnp.where((sph_dtex >= 0)[..., None], sph_texc, sph_base)
    sph_shading = srow[:, 8].astype(jnp.int32)
    sph_ior_raw = srow[:, 9]
    sph_ior = jnp.where(sph_ior_raw > 0.0, sph_ior_raw, 1.0)

    # --- triangle attributes ---
    e1 = trow[:, 0:3]
    e2 = trow[:, 3:6]
    n_tri_obj = vec.normalize(vec.cross(e1, e2))
    two_sided = trow[:, 10] != 0.0
    flip = two_sided & (vec.dot(n_tri_obj, d_obj) > 0.0)
    n_tri_obj = jnp.where(flip[..., None], -n_tri_obj, n_tri_obj)
    wgt = 1.0 - hit.bu - hit.bv
    uv0 = trow[:, 13:15]
    uv1 = trow[:, 15:17]
    uv2 = trow[:, 17:19]
    uu = uv0[..., 0] * wgt + uv1[..., 0] * hit.bu + uv2[..., 0] * hit.bv
    vv = uv0[..., 1] * wgt + uv1[..., 1] * hit.bu + uv2[..., 1] * hit.bv
    t_kd = trow[:, 6:9]
    t_dtex = trow[:, 9].astype(jnp.int32)
    t_texc = tex_ops.sample_texture_bilinear(scene, t_dtex, uu, vv)
    tri_albedo = jnp.where((t_dtex >= 0)[..., None], t_texc, t_kd)
    tri_shading = trow[:, 11].astype(jnp.int32)
    tri_ior_raw = trow[:, 12]
    tri_ior = jnp.where(tri_ior_raw > 0.0, tri_ior_raw, 1.0)

    n_obj = jnp.where(is_sph[..., None], n_sph_obj, n_tri_obj)
    normal_w = vec.normalize(vec.transform_vector(o2w, n_obj))

    albedo = jnp.where(is_sph[..., None], sph_albedo, tri_albedo)
    shading = jnp.where(is_sph, sph_shading, tri_shading)
    ior = jnp.where(is_sph, sph_ior, tri_ior)
    obj_id = jnp.where(is_tri, hit.prim, -1)

    miss = ~hit.hit
    return Surface(
        pos=jnp.where(miss[..., None], o + d * 1e6, pos_w),
        normal=jnp.where(
            miss[..., None], jnp.array([0.0, 1.0, 0.0], dtype=o.dtype), normal_w
        ),
        albedo=jnp.where(miss[..., None], 0.0, albedo),
        shading=jnp.where(miss, -1, shading),
        ior=jnp.where(miss, 1.0, ior),
        obj_id=jnp.where(miss, -1, obj_id),
    )
