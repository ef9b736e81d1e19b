"""Attribution probe: where does the wide closest drain's time go?

Round-3/4 experiments left a contradiction: subtile gating halved the
drain's MT work (closest time flat), the packed two-ref record removed
ref pressure (flat), carry-mode removed ref roundtrips entirely (~1%).
So what *is* the bound -- the Moller-Trumbore arithmetic, the _vcell
extraction broadcasts, or per-(row, subtile) fixed cost (row load, queue
decode, scalar gates)?

This tool times the production bounce population (cornell 15.5k, sorted
by the production (alive, octant, morton4) key, kernel-only) against
leaf-test variants that all use a NEVER-ACCEPT predicate, so t_best never
tightens and every variant walks the exact same node/leaf sequence:

  base    extraction + full MT math + never-accept
  nomath  extraction only (cells reduced to one compare)
  noext   one extraction + full MT math on constant triangle data
  empty   one extraction + compare (per-row fixed cost floor)
  prod    the production kernel (pruning on; context, not comparable)

base-nomath ~= MT arithmetic span; base-noext ~= extraction span;
empty ~= fixed per-(row,subtile) cost + walk. Decides whether a cheaper
intersector (fewer ops) or a cheaper layout (fewer broadcasts) can move
the drain at all.

Usage: python tools/drainprobe.py [--rays N] [--reps K] [--pop bounce]
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
    ap.add_argument("--rays", type=int, default=901_120)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pop", default="bounce", choices=["bounce", "shadow"])
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

    print("[setup] building scene...", flush=True)
    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    w = 1280
    # round the row count UP to a 64 multiple so --rays is a floor, not a
    # silent truncation (ADVICE round 4: 1_000_000 used to yield 983_040)
    h = max(64, ((-(-args.rays // w) + 63) // 64) * 64)
    n = w * h
    if n != args.rays:
        print(f"[setup] effective rays: {n} (requested {args.rays})",
              flush=True)
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    print("[setup] preparing kernel tables...", flush=True)
    pscene = tk.prepare(scene)
    wscene = wk.prepare_wide(pscene)

    print("[setup] first trace (compile)...", flush=True)
    hit = wk.trace_closest_wide(wscene, o, d)
    _ = np.asarray(hit.t)
    print("[setup] shade + populations...", flush=True)
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    sun = np.asarray([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)

    bo = np.asarray(surf.pos + surf.normal * 1e-3)
    bd = np.asarray(scat) if args.pop == "bounce" else np.broadcast_to(
        sun, (n, 3)).copy()
    active = np.asarray(hit.hit)

    # production sort order, computed host-side so timing is kernel-only:
    # (alive, direction octant, 4-bit origin morton), stable. Morton
    # quantization bounds match production exactly (ops/integrator.py:
    # scene INSTANCE bounds, not the active hit-point AABB -- ADVICE r4)
    bmin = np.min(np.asarray(scene.inst_bmin), axis=0)
    bmax = np.max(np.asarray(scene.inst_bmax), axis=0)
    inv_ext = 1.0 / np.maximum(bmax - bmin, 1e-6)
    octant = ((bd[:, 0] > 0).astype(np.int64) << 2) | (
        (bd[:, 1] > 0).astype(np.int64) << 1) | (bd[:, 2] > 0).astype(
        np.int64)
    q = np.clip(((bo - bmin) * inv_ext) * 4.0, 0.0, 3.0).astype(np.int64)
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    m4 = ((x & 2) << 2) | ((y & 2) << 1) | (z & 2) | (x & 1)
    key = np.where(active, octant * 16 + m4, 128)
    perm = np.argsort(key, kind="stable")
    so = jnp.asarray(bo[perm])
    sd = jnp.asarray(bd[perm])
    sact = jnp.asarray(active[perm])

    TRI_STRIDE = tk.TRI_STRIDE
    _vcell = tk._vcell
    BIG = jnp.float32(1e31)

    def base(leaf_row, count, ox, oy, oz, dx, dy, dz,
             t_best, pp_best, inst_bits, leaf_width=wk.WIDTH):
        rows = ox.shape[0]
        for j in range(leaf_width):
            b = j * TRI_STRIDE
            v0x, v0y, v0z = (_vcell(leaf_row, b + k, rows) for k in range(3))
            e1x, e1y, e1z = (
                _vcell(leaf_row, b + 3 + k, rows) for k in range(3))
            e2x, e2y, e2z = (
                _vcell(leaf_row, b + 6 + k, rows) for k in range(3))
            prim_bits = _vcell(leaf_row, b + 9, rows)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= 1e-8
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            bu = (tvx * px + tvy * py + tvz * pz) * inv_det
            ok = ok & (bu >= 0.0) & (bu <= 1.0)
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            bv = (dx * qx + dy * qy + dz * qz) * inv_det
            ok = ok & (bv >= 0.0) & (bu + bv <= 1.0)
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ok & (t > BIG) & (t < t_best)  # never accepts
            ok = ok & (j < count)
            pp = prim_bits.astype(jnp.int32) + inst_bits
            t_best = jnp.where(ok, t, t_best)
            pp_best = jnp.where(ok, pp, pp_best)
        return t_best, pp_best

    def nomath(leaf_row, count, ox, oy, oz, dx, dy, dz,
               t_best, pp_best, inst_bits, leaf_width=wk.WIDTH):
        rows = ox.shape[0]
        for j in range(leaf_width):
            b = j * TRI_STRIDE
            cells = [_vcell(leaf_row, b + k, rows) for k in range(10)]
            s = cells[0]
            for c in cells[1:]:
                s = s + c
            s = s + ox  # keep it lane-dependent
            ok = (s > BIG) & (j < count)
            t_best = jnp.where(ok, s, t_best)
            pp_best = jnp.where(ok, jnp.int32(inst_bits), pp_best)
        return t_best, pp_best

    rs = np.random.RandomState(7)
    CONST_TRIS = rs.uniform(-2.0, 2.0, size=(wk.WIDTH, 10)).astype(
        np.float32)

    def noext(leaf_row, count, ox, oy, oz, dx, dy, dz,
              t_best, pp_best, inst_bits, leaf_width=wk.WIDTH):
        rows = ox.shape[0]
        keep = _vcell(leaf_row, 0, rows)  # keep the row load alive
        for j in range(leaf_width):
            c = CONST_TRIS[j]
            v0x, v0y, v0z = float(c[0]), float(c[1]), float(c[2])
            e1x, e1y, e1z = float(c[3]), float(c[4]), float(c[5])
            e2x, e2y, e2z = float(c[6]), float(c[7]), float(c[8])
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= 1e-8
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            bu = (tvx * px + tvy * py + tvz * pz) * inv_det
            ok = ok & (bu >= 0.0) & (bu <= 1.0)
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            bv = (dx * qx + dy * qy + dz * qz) * inv_det
            ok = ok & (bv >= 0.0) & (bu + bv <= 1.0)
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ok & (t > BIG) & (t < t_best) & (keep < BIG)
            ok = ok & (j < count)
            t_best = jnp.where(ok, t, t_best)
            pp_best = jnp.where(ok, jnp.int32(inst_bits), pp_best)
        return t_best, pp_best

    def empty(leaf_row, count, ox, oy, oz, dx, dy, dz,
              t_best, pp_best, inst_bits, leaf_width=wk.WIDTH):
        rows = ox.shape[0]
        keep = _vcell(leaf_row, 0, rows)
        s = keep + ox
        ok = (s > BIG) & (jnp.int32(0) < count)
        t_best = jnp.where(ok, s, t_best)
        pp_best = jnp.where(ok, jnp.int32(inst_bits), pp_best)
        return t_best, pp_best

    orig = wk._leaf_tri_test_pp
    print(f"pop={args.pop}, {n} rays sorted by production key, "
          f"backend={jax.default_backend()}")

    def run():
        return wk.trace_closest_wide(wscene, so, sd, active=sact)

    results = {}
    try:
        for name, fn in [("prod", orig), ("base", base), ("nomath", nomath),
                         ("noext", noext), ("empty", empty)]:
            print(f"[variant {name}] compiling...", flush=True)
            wk._leaf_tri_test_pp = fn
            wk._run_trace.clear_cache()
            dt = timed(run, args.reps)
            results[name] = dt * 1e3
            print(f"  {name:8s} {dt*1e3:8.2f} ms   {n/dt/1e6:7.2f} Mrays/s")
    finally:
        # restore even on a mid-variant failure (compile error on TPU would
        # otherwise leave the module patched with a never-accept leaf test)
        wk._leaf_tri_test_pp = orig
        wk._run_trace.clear_cache()

    b, nm, ne, em = (results[k] for k in ("base", "nomath", "noext",
                                          "empty"))
    print("attribution (never-accept walk, same node/leaf sequence):")
    print(f"  MT math span       (base - nomath): {b - nm:7.2f} ms")
    print(f"  extraction span    (base - noext):  {b - ne:7.2f} ms")
    print(f"  fixed+walk floor   (empty):         {em:7.2f} ms")
    print(f"  unattributed       (base - math - extract - empty): "
          f"{b - (b - nm) - (b - ne) - em:7.2f} ms")


if __name__ == "__main__":
    main()
