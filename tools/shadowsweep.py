"""tile_rows sweep for the SHADOW (any-hit) kernel on production-like
sorted batches (round-5: the 318 ms shadow bucket never had its own
packet-size sweep; round-3 swept closest only).

Why packet size could matter more for any-hit than closest: a packet
leaves the walk early only when EVERY lane has latched occluded; smaller
packets reach all-latched sooner, and their per-packet node/leaf unions
are smaller. Populations mirror the frame's expensive shadow batches
(cornell bench scene, lanes sorted host-side by the production
(alive, octant, morton4) key so timing is kernel-only):

* anyhit-cosine: cosine-scatter directions from hit points (the final
  bounce's sky-visibility batch);
* anyhit-restir: 50/50 sun / cosine mixture (ReSTIR winner batch).

Usage: python tools/shadowsweep.py [--rays 1802240] [--tile-rows 32,16,8]
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

    sync(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1_802_240)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-rows", default="32,16,8")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene, cornell_camera,
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
    w = 1280
    h = max(64, ((-(-args.rays // w) + 63) // 64) * 64)
    n = w * h
    if n != args.rays:
        print(f"[setup] effective rays: {n}", flush=True)
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)
    wscene = wk.prepare_wide(tk.prepare(scene))
    hit = wk.trace_closest_wide(wscene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    s2, u01 = rng_mod.next_float(state)
    sun = np.asarray([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)

    bo = np.asarray(surf.pos + surf.normal * 1e-3)
    active = np.asarray(hit.hit)
    pops = {
        "anyhit-cosine": np.asarray(scat),
        "anyhit-restir": np.where(
            (np.asarray(u01) < 0.5)[:, None], sun[None, :], np.asarray(scat)
        ),
    }

    # production morton bounds (scene instance bounds, ops/integrator.py)
    bmin = np.min(np.asarray(scene.inst_bmin), axis=0)
    bmax = np.max(np.asarray(scene.inst_bmax), axis=0)
    inv_ext = 1.0 / np.maximum(bmax - bmin, 1e-6)

    trs = [int(t) for t in args.tile_rows.split(",")]
    for pop, bd in pops.items():
        octant = ((bd[:, 0] > 0).astype(np.int64) << 2) | (
            (bd[:, 1] > 0).astype(np.int64) << 1) | (
            bd[:, 2] > 0).astype(np.int64)
        q = np.clip(((bo - bmin) * inv_ext) * 4.0, 0.0, 3.0).astype(np.int64)
        m4 = ((q[:, 0] & 2) << 2) | ((q[:, 1] & 2) << 1) | (
            q[:, 2] & 2) | (q[:, 0] & 1)
        key = np.where(active, octant * 16 + m4, 128)
        perm = np.argsort(key, kind="stable")
        so = jnp.asarray(bo[perm])
        sdir = jnp.asarray(bd[perm])
        sact = jnp.asarray(active[perm])
        print(f"[{pop}] {n} lanes, {int(active.sum())} active, sorted")
        base = None
        for tr in trs:
            dt = timed(
                lambda tr=tr: wk.shadow_occlusion_wide(
                    wscene, so, sdir, 1e29, active=sact, tile_rows=tr
                ),
                args.reps,
            )
            tag = "" if base is None else f"  ({base/dt:4.2f}x vs tr32)"
            if base is None:
                base = dt
            print(f"  tile_rows={tr:2d}  {dt*1e3:8.2f} ms  "
                  f"{n/dt/1e6:6.2f} Mrays/s{tag}")


if __name__ == "__main__":
    main()
