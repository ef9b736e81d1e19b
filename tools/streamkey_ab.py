"""Stream-kernel sort-key A/B at config-5 scale (round-4 treelet pivot,
step 1: does TREELET-LOCALITY ordering beat octant+origin-morton on the
1M-tri HBM-streaming kernel, before any kernel surgery?).

The cornell treelet A/B (BENCHLOG round 4) proved the unions reduction is
real (~2.9x kernel work) but per-round overheads ate it at 15k-tri scale;
its conclusion pivots the idea to the streaming regime, where leaf drains
are 8 KB DMA bursts and unions are 10-50x larger. The CHEAPEST version of
that pivot is a pure sort-key change on the existing flat kernel: bin rays
by the treelet their slab entry says they will reach first (a
direction+origin+scene-structure key), instead of by direction octant +
4-bit origin morton. Packets become subtree-pure without any new kernel,
rounds, or masks.

Measures, on the terrain bounce population (pre-sorted rays, so pure
kernel effect) per key variant: closest + shadow kernel time, and the
perm-build cost delta (counting-sort cost is linear in bins).

Usage: python tools/streamkey_ab.py [--grid-x 1024 --grid-z 512]
       [--width 1280 --height 704] [--treelets 32] [--reps 3]
"""

from __future__ import annotations

import argparse
import heapq
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cut_treelets(scene, n_target: int, inst: int = 0):
    """Cut one instance's binary BLAS into <= n_target subtrees, greedily
    splitting the largest by primitive count. Returns (roots, bounds
    (T,6)) in node-index order.

    Subtree spans are tracked during the descent: models/bvh.py emits
    [node, RIGHT subtree, LEFT subtree], so node i's right child spans
    [i+1, left_field_i) and its left child inherits the parent's span end
    (a node's SKIP field is its on-miss jump target -- an ancestor's right
    child that can sit at a LOWER index -- not its span end)."""
    ifields = np.asarray(scene.blas_ifields)
    bmin = np.asarray(scene.blas_bmin)
    bmax = np.asarray(scene.blas_bmax)
    nn = ifields.shape[0]
    leaf_counts = np.where(ifields[:, 2] > 0, ifields[:, 2], 0)
    csum = np.concatenate([[0], np.cumsum(leaf_counts)])

    inst_roots = sorted(int(r) for r in np.asarray(scene.inst_blas_root))
    root = int(np.asarray(scene.inst_blas_root)[inst])
    later = [r for r in inst_roots if r > root]
    root_end = later[0] if later else nn

    def prims(i: int, end: int) -> int:
        return int(csum[end] - csum[i])

    heap = [(-prims(root, root_end), root, root_end)]
    while len(heap) < n_target:
        negp, i, end = heapq.heappop(heap)
        if ifields[i, 2] > 0:  # leaf: cannot split further
            heapq.heappush(heap, (negp, i, end))
            break
        left = int(ifields[i, 0])
        heapq.heappush(heap, (-prims(i + 1, left), i + 1, left))
        heapq.heappush(heap, (-prims(left, end), left, end))
    roots = sorted(i for _negp, i, _end in heap)
    bounds = np.concatenate([bmin[roots], bmax[roots]], axis=1)
    return np.asarray(roots, np.int32), bounds.astype(np.float32)


def treelet_entry(bounds, o, d, t_cap):
    """(N, T) slab entry t of each ray into each treelet AABB (identity
    instance transform assumed -- terrain); +inf on miss/inactive."""
    import jax.numpy as jnp

    n = o.shape[0]
    T = bounds.shape[0]
    b = jnp.asarray(bounds)
    inv = 1.0 / jnp.where(d != 0.0, d, 1e-8)
    lo = jnp.full((n, T), 1e-4, jnp.float32)
    hi = jnp.full((n, T), jnp.inf, jnp.float32)
    for ax in range(3):
        t1 = (b[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        t2 = (b[None, :, 3 + ax] - o[:, None, ax]) * inv[:, None, ax]
        lo = jnp.maximum(lo, jnp.minimum(t1, t2))
        hi = jnp.minimum(hi, jnp.maximum(t1, t2))
    ok = (hi >= lo) & (lo <= t_cap[:, None])
    return jnp.where(ok, lo, jnp.inf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain",
                    choices=["terrain", "cornell"],
                    help="terrain = 1M-tri stream kernel (config 5); "
                         "cornell = 15.5k-tri VMEM wide kernel (the "
                         "headline bench scene)")
    ap.add_argument("--grid-x", type=int, default=1024)
    ap.add_argument("--grid-z", type=int, default=512)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=704)
    ap.add_argument("--treelets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.ops import rays as rays_mod
    from ilgpu_raytracing_tpu.ops import sort as sort_mod
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as sk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.ops.sky import sun_direction
    from ilgpu_raytracing_tpu.utils import rng as rng_mod

    t0 = time.time()
    if args.scene == "terrain":
        from ilgpu_raytracing_tpu.models.terrain import (
            build_terrain_scene,
            terrain_camera,
        )

        _, scene = build_terrain_scene(
            grid_x=args.grid_x, grid_z=args.grid_z,
            blas_leaf_size=64, bvh_method="sah",
        )
        cam_fn = terrain_camera
        sscene = sk.prepare_stream(scene)
        trace_packed = lambda oo, dd, act: sk.trace_closest_stream_packed(
            sscene, oo, dd, active=act)
        trace_full = lambda oo, dd: sk.trace_closest_stream(sscene, oo, dd)
        shadow = lambda oo, dd, act: sk.shadow_occlusion_stream(
            sscene, oo, dd, 1e29, active=act)
    else:
        from ilgpu_raytracing_tpu.models.cornell import (
            build_cornell_scene,
            cornell_camera,
        )
        from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
        from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk

        _, scene = build_cornell_scene(
            tess=24, sphere_tess=(48, 72), blas_leaf_size=8,
            bvh_method="sah",
        )
        cam_fn = cornell_camera
        wscene = wk.prepare_wide(tk.prepare(scene))
        trace_packed = lambda oo, dd, act: wk.trace_closest_wide_packed(
            wscene, oo, dd, active=act)
        trace_full = lambda oo, dd: wk.trace_closest_wide(wscene, oo, dd)
        shadow = lambda oo, dd, act: wk.shadow_occlusion_wide(
            wscene, oo, dd, 1e29, active=act)
    print(f"scene: {int(scene.tri_v0.shape[0])} tris, ready in "
          f"{time.time()-t0:.1f}s", flush=True)

    w, h = args.width, args.height
    n1 = w * h
    cam = cam_fn(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    hit = trace_full(o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    bo_l, bd_l, act_l = [], [], []
    for s in range(args.spp):
        state = rng_mod.seed_from_index(
            jnp.arange(n1, dtype=jnp.int32), w, np.uint32(s), np.uint32(7),
            np.uint32(0x9E3779B9), np.uint32(1),
        )
        _, scat = sample_hemisphere_cosine(surf.normal, state)
        bo_l.append(surf.pos + surf.normal * 1e-3)
        bd_l.append(scat)
        act_l.append(hit.hit)
    bo = jnp.concatenate(bo_l)
    bd = jnp.concatenate(bd_l)
    active = jnp.concatenate(act_l)
    n = int(bo.shape[0])
    sun = jnp.broadcast_to(
        sun_direction(0.8, 0.45), (n, 3)
    )

    # production cut (world-space, all instances); the tool's own
    # cut_treelets(single-instance) is kept above as the original
    # experiment's record
    from ilgpu_raytracing_tpu.models.bvh import cut_scene_treelets

    tbounds = cut_scene_treelets(scene, args.treelets)
    T = tbounds.shape[0]
    print(f"N = {n} bounce lanes, {T} treelets, "
          f"backend={jax.default_backend()}", flush=True)

    bmin = jnp.min(scene.inst_bmin, axis=0)
    bmax = jnp.max(scene.inst_bmax, axis=0)
    mb = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))

    def key_mortonoct(oo, dd):
        return sort_mod._ray_perm(oo, dd, active, mb)

    def octant_of(dd):
        return (
            ((dd[:, 0] > 0).astype(jnp.int32) << 2)
            | ((dd[:, 1] > 0).astype(jnp.int32) << 1)
            | (dd[:, 2] > 0).astype(jnp.int32)
        )

    def key_treelet(oo, dd, with_octant: str):
        # bins: [0, G) treelet groups for active rays with a slab hit,
        # G = active rays missing every treelet (e.g. sphere-instance-only
        # hits -- the cut covers the mesh instance; they stay ACTIVE),
        # G+1 = dead lanes (tail, so the alive prefix mask stays valid)
        t_cap = jnp.where(active, jnp.float32(1e30), 0.0)
        t_lo = treelet_entry(tbounds, oo, dd, t_cap)
        tid = jnp.argmin(t_lo, axis=1).astype(jnp.int32)
        okm = jnp.isfinite(jnp.min(t_lo, axis=1))
        if with_octant == "none":
            key, groups = tid, T
        elif with_octant == "minor":
            key, groups = tid * 8 + octant_of(dd), 8 * T
        else:  # major
            key, groups = octant_of(dd) * T + tid, 8 * T
        bins = groups + 2
        key = jnp.where(okm, key, jnp.int32(groups))
        key = jnp.where(active, key, jnp.int32(groups + 1))
        return sort_mod._perm_from_key(key, bins)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    def timed(fn, reps):
        f = jax.jit(fn)
        sync(f())
        ts = []
        for _ in range(reps):
            t1 = time.time()
            sync(f())
            ts.append(time.time() - t1)
        return min(ts)

    # each variant keys the closest trace on the SCATTER direction and the
    # shadow trace on the SUN direction (matching production, where each
    # dispatch sorts its own rays)
    variants = [
        ("octant+morton4 (current)",
         lambda: key_mortonoct(bo, bd), lambda: key_mortonoct(bo, sun)),
        ("treelet only",
         lambda: key_treelet(bo, bd, "none"),
         lambda: key_treelet(bo, sun, "none")),
        ("treelet major + octant",
         lambda: key_treelet(bo, bd, "minor"),
         lambda: key_treelet(bo, sun, "minor")),
        ("octant major + treelet",
         lambda: key_treelet(bo, bd, "major"),
         lambda: key_treelet(bo, sun, "major")),
    ]

    n_alive = jnp.sum(active.astype(jnp.int32))
    act_s = jnp.arange(n, dtype=jnp.int32) < n_alive

    t_ref = None
    for name, keyfn, skeyfn in variants:
        perm, pos = jax.jit(keyfn)()
        bo_s = jax.device_put(jnp.take(bo, perm, axis=0))
        bd_s = jax.device_put(jnp.take(bd, perm, axis=0))
        sperm, _sp = jax.jit(skeyfn)()
        so_s = jax.device_put(jnp.take(bo, sperm, axis=0))
        sd_s = jax.device_put(jnp.take(sun, sperm, axis=0))
        dt_c = timed(lambda: trace_packed(bo_s, bd_s, act_s), args.reps)
        dt_s = timed(lambda: shadow(so_s, sd_s, act_s), args.reps)
        dt_p = timed(keyfn, args.reps)
        # exactness: unsorted t must match the first variant's bit-for-bit
        t_s, _pp = jax.jit(lambda: trace_packed(bo_s, bd_s, act_s))()
        t_u = np.asarray(jnp.take(t_s, pos, axis=0))
        if t_ref is None:
            t_ref = t_u
        exact = "exact" if np.array_equal(t_ref, t_u) else "MISMATCH"
        print(f"  {name:28s} closest {dt_c*1e3:8.1f} ms "
              f"({n/dt_c/1e6:5.2f} Mr/s)  shadow {dt_s*1e3:8.1f} ms  "
              f"permbuild {dt_p*1e3:6.1f} ms  [{exact}]", flush=True)


if __name__ == "__main__":
    main()
