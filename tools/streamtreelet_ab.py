"""Stream treelet-rounds A/B at config-5 scale (real TPU).

Times the stream treelet rounds (ops/treelet.trace_closest_treelet_stream
_packed over ops/pallas/streamtreelet_kernel.py) against the flat sorted
stream dispatch with the round-4 DESTINATION-treelet sort key (the
production path after tools/streamkey_ab.py), on the 1M-tri terrain
bounce population. End-to-end in one jit each (sort glue included both
sides); verifies lane-for-lane equality first.

Usage: python tools/streamtreelet_ab.py [--treelets 32] [--reps 3]
       [--grid-x 1024 --grid-z 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, reps=3):
    import jax

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    f = jax.jit(fn)
    sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(f())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
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

    from ilgpu_raytracing_tpu.models.terrain import (
        build_terrain_scene,
        terrain_camera,
    )
    from ilgpu_raytracing_tpu.ops import rays as rays_mod
    from ilgpu_raytracing_tpu.ops import sort as sort_mod
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops import treelet as treelet_mod
    from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as sk
    from ilgpu_raytracing_tpu.ops.pallas import streamtreelet_kernel as tlsk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.utils import rng as rng_mod

    t0 = time.time()
    _, scene = build_terrain_scene(
        grid_x=args.grid_x, grid_z=args.grid_z,
        blas_leaf_size=64, bvh_method="sah",
    )
    sscene = sk.prepare_stream(scene)
    sts = tlsk.prepare_treelets_stream(sscene, args.treelets)
    print(f"scene: {int(scene.tri_v0.shape[0])} tris, {sts.n_treelets} "
          f"treelets, ready in {time.time()-t0:.1f}s", flush=True)

    w, h = args.width, args.height
    n1 = w * h
    cam = terrain_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    hit = sk.trace_closest_stream(sscene, o, d)
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
    print(f"N = {n} bounce lanes, backend={jax.default_backend()}",
          flush=True)

    def flat():
        return sort_mod.sorted_closest_packed(
            lambda oo, dd, a: sk.trace_closest_stream_packed(
                sscene, oo, dd, active=a),
            lambda t, pp: sk.decode_stream_hits(sscene, bo, bd, t, pp),
            bo, bd, active, None, sscene.sortkey_bounds)

    def rounds(k=None):
        def fn():
            t, pp = treelet_mod.trace_closest_treelet_stream_packed(
                sts, bo, bd, active=active, cleanup_after=k)
            return sk.decode_stream_hits(sts.sscene, bo, bd, t, pp)
        return fn

    h_f = jax.jit(flat)()
    for name, variant in (("rounds", rounds()), ("cleanup1", rounds(1)),
                          ("cleanup2", rounds(2))):
        h_t = jax.jit(variant)()
        m = np.asarray(h_f.hit) | np.asarray(h_t.hit)
        bad = 0
        for f in ("t", "prim", "inst"):
            a = np.asarray(getattr(h_f, f))
            b = np.asarray(getattr(h_t, f))
            bad += int(((a != b) & m).sum())
        print(f"  equality[{name}]: {bad} mismatched live-lane fields "
              f"of {int(m.sum())} lanes", flush=True)

    def report(name, dt):
        print(f"  {name:44s} {dt*1e3:8.1f} ms  "
              f"({n/dt/1e6:6.2f} Mrays/s)", flush=True)

    report("flat sorted (treelet key, current)", timed(flat, args.reps))
    report("treelet rounds (full)", timed(rounds(), args.reps))
    for k in (1, 2, 3):
        report(f"treelet rounds={k}+flat cleanup", timed(rounds(k),
                                                         args.reps))


if __name__ == "__main__":
    main()
