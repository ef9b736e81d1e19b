"""Shared-per-bounce-sort A/B on the real scene (real TPU).

A bounce currently pays TWO independent sorted dispatches (closest scatter
trace + shadow trace), each with its own perm build, forward row gather and
unsort. This harness measures the candidate restructure: ONE perm built
from the scatter ray's (alive-any, morton, octant) key, one fused (N,13)
forward gather carrying both rays, both kernels run on the shared order
with per-kernel active masks riding the gather.

Costs compared at frame-realistic bounce-1 populations (spp-batched lanes,
~85%% scatter-active, shadow rays ~70%% sun-coherent):

  A  separate: sorted_shadow + sorted_closest_packed  (today's path)
  B  shared:   one perm, fused gather, masked kernels

B's kernel times can regress vs A (shadow rays lose their own octant key;
per-kernel dead lanes sit inside live packets instead of the tail), so the
harness prints kernel-attributable time and total time for both.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, reps=5):
    import jax

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf.sum() if hasattr(leaf, "sum") else leaf)

    f = jax.jit(fn)
    sync(f())
    t0 = time.time()
    for _ in range(reps):
        out = f()
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sun-frac", type=float, default=0.7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.ops import rays as rays_mod
    from ilgpu_raytracing_tpu.ops import sort as sort_mod
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.utils import rng as rng_mod
    from ilgpu_raytracing_tpu.utils import vec

    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    w, h = 1280, 704
    n1 = w * h
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    pscene = tk.prepare(scene)
    wscene = wk.prepare_wide(pscene)

    hit = wk.trace_closest_wide(wscene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    sun = vec.normalize(jnp.asarray([0.35, 0.75, 0.2], jnp.float32))

    so_l, sw_l, sa_l, bo_l, bd_l, ba_l = [], [], [], [], [], []
    for s in range(args.spp):
        state = rng_mod.seed_from_index(
            jnp.arange(n1, dtype=jnp.int32), w, np.uint32(s), np.uint32(7),
            np.uint32(0x9E3779B9), np.uint32(1),
        )
        state, scat = sample_hemisphere_cosine(surf.normal, state)
        state, u1 = rng_mod.next_float(state)
        state, sky_dir = sample_hemisphere_cosine(surf.normal, state)
        wi = jnp.where((u1 < args.sun_frac)[:, None],
                       jnp.broadcast_to(sun, scat.shape), sky_dir)
        so_l.append(surf.pos + surf.normal * 1e-3)
        sw_l.append(wi)
        sa_l.append(hit.hit & (u1 > 0.12))   # ~88% of hits have a sample
        bo_l.append(surf.pos + surf.normal * 1e-3)
        bd_l.append(scat)
        ba_l.append(hit.hit)
    so = jnp.concatenate(so_l)
    swi = jnp.concatenate(sw_l)
    sact = jnp.concatenate(sa_l)
    bo = jnp.concatenate(bo_l)
    bd = jnp.concatenate(bd_l)
    bact = jnp.concatenate(ba_l)
    n = int(bo.shape[0])

    bmin = jnp.min(scene.inst_bmin, axis=0)
    bmax = jnp.max(scene.inst_bmax, axis=0)
    mb = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))

    print(f"N = {n} lanes, backend={jax.default_backend()}, "
          f"shadow-active {float(jnp.mean(sact.astype(jnp.float32))):.2f}, "
          f"scatter-active {float(jnp.mean(bact.astype(jnp.float32))):.2f}",
          flush=True)

    def report(name, dt):
        print(f"  {name:46s} {dt*1e3:8.2f} ms", flush=True)

    # ---- A: today's two independent sorted dispatches ----
    def a_shadow():
        return sort_mod.sorted_shadow(
            lambda oo, dd, a: wk.shadow_occlusion_wide(wscene, oo, dd, 1e29,
                                                       active=a),
            so, swi, sact, mb)

    def a_closest():
        return sort_mod.sorted_closest_packed(
            lambda oo, dd, a: wk.trace_closest_wide_packed(wscene, oo, dd,
                                                           active=a),
            lambda t, pp: wk.decode_wide_hits(wscene, bo, bd, t, pp),
            bo, bd, bact, mb)

    ta_s = timed(a_shadow, args.reps)
    ta_c = timed(a_closest, args.reps)
    report("A shadow (own sort)", ta_s)
    report("A closest (own sort)", ta_c)
    report("A total", ta_s + ta_c)

    # ---- B: one shared perm keyed on the scatter ray ----
    def b_shared():
        alive_any = sact | bact
        octant = (
            ((bd[:, 0] > 0).astype(jnp.int32) << 2)
            | ((bd[:, 1] > 0).astype(jnp.int32) << 1)
            | (bd[:, 2] > 0).astype(jnp.int32)
        )
        key = jnp.where(
            alive_any,
            octant * 16 + sort_mod._morton4(bo, mb[0], mb[1]),
            jnp.int32(128),
        )
        perm, pos = sort_mod._perm_from_key(key, 129)
        flags = sact.astype(jnp.float32) + 2.0 * bact.astype(jnp.float32)
        rows = jnp.concatenate(
            [so, swi, bo, bd, flags[:, None]], axis=1)  # (N,13)
        rs = jnp.take(rows, perm, axis=0)
        fl = rs[:, 12].astype(jnp.int32)
        occ_s = wk.shadow_occlusion_wide(
            wscene, rs[:, 0:3], rs[:, 3:6], 1e29, active=(fl & 1) != 0)
        t_s, pp_s = wk.trace_closest_wide_packed(
            wscene, rs[:, 6:9], rs[:, 9:12], active=(fl & 2) != 0)
        out = jnp.concatenate(
            [t_s[:, None],
             jax.lax.bitcast_convert_type(pp_s, jnp.float32)[:, None],
             occ_s.astype(jnp.float32)[:, None]], axis=1)
        ro = jnp.take(out, pos, axis=0)
        hitrec = wk.decode_wide_hits(
            wscene, bo, bd, ro[:, 0],
            jax.lax.bitcast_convert_type(ro[:, 1], jnp.int32))
        return hitrec, ro[:, 2] != 0.0

    tb = timed(b_shared, args.reps)
    report("B shared (one sort, both kernels)", tb)
    print(f"  speedup A->B: {(ta_s + ta_c) / tb:.3f}x", flush=True)

    # correctness spot check: B must equal A lane-for-lane on active lanes
    ha, hb = jax.jit(a_closest)(), jax.jit(b_shared)()[0]
    occ_a = jax.jit(a_shadow)()
    occ_b = jax.jit(b_shared)()[1]
    act = np.asarray(bact)
    same_t = np.allclose(np.asarray(ha.t)[act], np.asarray(hb.t)[act])
    sa = np.asarray(sact)
    same_occ = (np.asarray(occ_a)[sa] == np.asarray(occ_b)[sa]).all()
    print(f"  closest t match: {same_t}  shadow occ match: {same_occ}",
          flush=True)


if __name__ == "__main__":
    main()
