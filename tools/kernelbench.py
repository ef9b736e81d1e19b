"""Isolated traversal-kernel microbenchmark (real TPU).

Measures Mrays/s of the packet kernels on three ray populations that
mirror the production frame's batches (bench.py), in the production
block-linear pixel order (ops/layout.py):

* primary  -- camera rays, coherent 64x64 blocks;
* bounce   -- cosine-hemisphere scatter rays from primary hit points;
* shadow   -- rays from hit points toward the sun.

Usage: python tools/kernelbench.py [--rays N] [--front K] [--tile-rows R]
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

    sync(fn())  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=901_120)  # 1280x704
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-rows", type=int, default=32)
    ap.add_argument("--front", type=str, default="4",
                    help="comma list of frontier sizes to compare")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pop", default="all",
                    help="comma list: primary,bounce,shadow or all")
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
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.utils import rng as rng_mod

    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    n_tris = int(scene.tri_v0.shape[0])
    w = 1280
    h = max(64, (-(-args.rays // w) // 64) * 64)
    n = w * h
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)  # production block order
    o, d = rays_mod.generate_rays(cam, u, v)

    pscene = tk.prepare(scene)
    wscene = wk.prepare_wide(pscene)

    # one real trace to build the bounce/shadow populations
    hit = wk.trace_closest_wide(wscene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    sun = np.asarray([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)

    bo = surf.pos + surf.normal * 1e-3
    bd = scat
    sd = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    active = hit.hit

    print(f"scene: cornell {n_tris} tris, {n} rays ({w}x{h} block order), "
          f"backend={jax.default_backend()}, tile_rows={args.tile_rows}")

    pops = (
        ["primary", "bounce", "shadow"]
        if args.pop == "all"
        else args.pop.split(",")
    )
    fronts = [int(f) for f in args.front.split(",")]

    def report(name, dt):
        print(f"  {name:34s} {n / dt / 1e6:7.2f} Mrays/s   {dt*1e3:8.2f} ms")

    tr = args.tile_rows
    for pop in pops:
        print(f"[{pop}]")
        for front in fronts:
            if pop == "primary":
                report(f"wide closest front={front}", timed(
                    lambda: wk.trace_closest_wide(
                        wscene, o, d, tile_rows=tr, front=front),
                    args.reps))
            elif pop == "bounce":
                report(f"wide closest front={front}", timed(
                    lambda: wk.trace_closest_wide(
                        wscene, bo, bd, active=active, tile_rows=tr,
                        front=front),
                    args.reps))
            elif pop == "shadow":
                report(f"wide anyhit  front={front}", timed(
                    lambda: wk.shadow_occlusion_wide(
                        wscene, bo, sd, 1e29, active=active, tile_rows=tr,
                        front=front),
                    args.reps))


if __name__ == "__main__":
    main()
