"""Treelet-reformation A/B on the real bounce population (real TPU).

Times the round-4 treelet-binned closest trace (ops/treelet.py) against
the flat sorted wide-kernel dispatch it replaces, at the bench frame's
bounce lane count, each end-to-end in one jit (sort glue included on both
sides). Verifies lane-for-lane identical hit records first.

Usage: python tools/treelet_ab.py [--spp 2] [--treelets 32] [--reps 5]
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
    ap.add_argument("--treelets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-rows", type=int, default=32)
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
    from ilgpu_raytracing_tpu.ops import treelet as treelet_mod
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import treelet_kernel as tlk
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

    wscene = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(wscene, args.treelets)
    rows_stat = _cut_rows(ts)
    print(f"cut: {ts.n_treelets} treelets; rows/treelet "
          f"min/med/max = {rows_stat[0]}/{rows_stat[1]}/{rows_stat[2]}",
          flush=True)

    hit = wk.trace_closest_wide(wscene, o, d)
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

    bmin = jnp.min(scene.inst_bmin, axis=0)
    bmax = jnp.max(scene.inst_bmax, axis=0)
    mb = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))

    print(f"N = {n} bounce lanes, backend={jax.default_backend()}",
          flush=True)

    def flat():
        return sort_mod.sorted_closest_packed(
            lambda oo, dd, a: wk.trace_closest_wide_packed(
                wscene, oo, dd, active=a),
            lambda t, pp: wk.decode_wide_hits(wscene, bo, bd, t, pp),
            bo, bd, active, mb)

    def treelet():
        t, pp = treelet_mod.trace_closest_treelet_packed(
            ts, bo, bd, active=active, tile_rows=args.tile_rows)
        return wk.decode_wide_hits(wscene, bo, bd, t, pp)

    def treelet_single():
        t, pp = treelet_mod.trace_closest_treelet_single(
            ts, bo, bd, active=active, tile_rows=args.tile_rows)
        return wk.decode_wide_hits(wscene, bo, bd, t, pp)

    def treelet_cleanup(k):
        def fn():
            t, pp = treelet_mod.trace_closest_treelet_packed(
                ts, bo, bd, active=active, tile_rows=args.tile_rows,
                cleanup_after=k)
            return wk.decode_wide_hits(wscene, bo, bd, t, pp)
        return fn

    # lane-for-lane equality first
    h_f = jax.jit(flat)()
    for name, variant in (("cleanup1", treelet_cleanup(1)),
                          ("cleanup2", treelet_cleanup(2))):
        h_t = jax.jit(variant)()
        for f in ("t", "prim", "inst", "kind"):
            a = np.asarray(getattr(h_f, f))
            b = np.asarray(getattr(h_t, f))
            neq = (a != b)
            m = np.asarray(h_f.hit) | np.asarray(h_t.hit)
            bad = (neq & m).sum()
            print(f"  equality[{name}] {f}: {bad}/{m.sum()} mismatched "
                  f"live lanes", flush=True)

    def report(name, dt):
        print(f"  {name:44s} {dt*1e3:8.2f} ms  "
              f"({n/dt/1e6:6.2f} Mrays/s)", flush=True)

    report("flat sorted_closest_packed (current)", timed(flat, args.reps))
    for k in (1, 2, 3):
        report(f"treelet rounds={k}+flat cleanup",
               timed(treelet_cleanup(k), args.reps))


def _cut_rows(ts):
    import numpy as np

    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk

    wc_all = np.asarray(ts.wscene.wide_child).reshape(-1, wk.WIDTH)
    counts = []
    for r in np.asarray(ts.t_root)[: ts.n_treelets]:
        c = 0
        stack = [int(r)]
        while stack:
            x = stack.pop()
            for ch in wc_all[x]:
                if ch >= 0:
                    stack.append(int(ch))
                elif ch <= -2:
                    c += 1
        counts.append(c)
    counts.sort()
    return counts[0], counts[len(counts) // 2], counts[-1]


if __name__ == "__main__":
    main()
