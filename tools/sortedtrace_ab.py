"""Sorted-trace end-to-end A/B on the real scene (real TPU).

Times one spp-batched bounce closest/shadow trace through the three
dispatch routes at the frame's lane count, in ONE jit each (so XLA makes
the same layout choices it makes in-frame):

  raw        kernel on pre-sorted rays (glue-free floor)
  legacy     sorted_closest (full HitRecord rides the unsort gather)
  packed     sorted_closest_packed (two fields ride, decode after)

The difference raw->packed is the whole remaining sort-glue cost per
trace: perm build + pack gather + unsort + decode.
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
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

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
    # spp-batched scatter directions (the frame batches all spp's lanes)
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

    bmin = jnp.min(scene.inst_bmin, axis=0)
    bmax = jnp.max(scene.inst_bmax, axis=0)
    mb = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))

    # pre-sorted copy for the glue-free floor
    perm, pos = sort_mod._ray_perm(bo, bd, active, mb)
    bo_s = jnp.take(bo, perm, axis=0)
    bd_s = jnp.take(bd, perm, axis=0)
    act_s = jnp.arange(n) < jnp.sum(active.astype(jnp.int32))
    bo_s, bd_s, act_s = jax.device_put((bo_s, bd_s, act_s))

    print(f"N = {n} bounce lanes, backend={jax.default_backend()}",
          flush=True)

    def report(name, dt):
        print(f"  {name:44s} {dt*1e3:8.2f} ms  "
              f"({n/dt/1e6:6.2f} Mrays/s)", flush=True)

    report("closest raw (pre-sorted rays)", timed(
        lambda: wk.trace_closest_wide_packed(wscene, bo_s, bd_s,
                                             active=act_s),
        args.reps))
    report("closest legacy sorted_closest", timed(
        lambda: sort_mod.sorted_closest(
            lambda oo, dd, a: wk.trace_closest_wide(wscene, oo, dd,
                                                    active=a),
            bo, bd, active, mb),
        args.reps))
    report("closest packed sorted_closest_packed", timed(
        lambda: sort_mod.sorted_closest_packed(
            lambda oo, dd, a: wk.trace_closest_wide_packed(
                wscene, oo, dd, active=a),
            lambda t, pp: wk.decode_wide_hits(wscene, bo, bd, t, pp),
            bo, bd, active, mb),
        args.reps))
    report("shadow raw (pre-sorted rays)", timed(
        lambda: wk.shadow_occlusion_wide(wscene, bo_s, bd_s, 1e29,
                                         active=act_s),
        args.reps))
    report("shadow sorted_shadow", timed(
        lambda: sort_mod.sorted_shadow(
            lambda oo, dd, a: wk.shadow_occlusion_wide(wscene, oo, dd,
                                                       1e29, active=a),
            bo, bd, active, mb),
        args.reps))
    report("perm build only", timed(
        lambda: sort_mod._ray_perm(bo, bd, active, mb), args.reps))


if __name__ == "__main__":
    main()
