"""v5e roofline for the packet traversal design (real TPU).

Measures, on the bench scene's actual ray populations, the per-packet
node/leaf visit UNIONS (trace_closest_wide_stats counters), times the same
traces, and derives:

* the VPU-cycle cost model for one wide-node visit and one leaf-row visit;
* the implied Mrays/s ceiling of THIS traversal design at the measured
  unions (what optimizing glue to zero could ever reach);
* the ceiling at ideal (per-ray) visit counts — what a design that tested
  only each ray's own nodes/leaves would reach on the VPU — i.e. the
  headroom that better packing/sorting could unlock vs what needs an
  algorithmic change (fewer rays).

Prints a BENCHLOG-ready section. Run with the TPU idle.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# v5e per-core numbers (public: cloud.google.com/tpu/docs/v5e)
VPU_LANES = 8 * 128
CLOCK_GHZ = 0.94
HBM_GBS = 819.0


def timed(fn, reps=5):
    def sync(x):
        import jax

        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    sync(fn())
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=901_120)
    ap.add_argument("--tile-rows", type=int, default=32)
    ap.add_argument("--leaf", type=int, default=8,
                    help="blas_leaf_size for the scene build")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
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
        tess=24, sphere_tess=(48, 72), blas_leaf_size=args.leaf,
        bvh_method="sah",
    )
    n_tris = int(scene.tri_v0.shape[0])
    w = 1280
    h = max(64, (-(-args.rays // w) // 64) * 64)
    n = w * h
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    wscene = wk.prepare_wide(tk.prepare(scene))
    tr = args.tile_rows
    lanes = tr * 128
    n_wide = np.asarray(wscene.wide_child).size // 8

    hit = wk.trace_closest_wide(wscene, o, d, tile_rows=tr)
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    bo = surf.pos + surf.normal * 1e-3
    active = hit.hit

    def sorted_rays(o3, d3, act):
        key = sort_mod.octant_alive_key(d3, act)
        perm, _ = sort_mod._perm_from_key(key)
        return (
            jnp.take(o3, perm, axis=0), jnp.take(d3, perm, axis=0),
            jnp.take(act, perm, axis=0),
        )

    so, sd, sact = sorted_rays(bo, scat, active)
    sun = np.asarray([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)
    sh_d = jnp.broadcast_to(jnp.asarray(sun), (n, 3))

    pops = {
        "primary (coherent)": (o, d, None),
        "bounce scatter (sorted)": (so, sd, sact),
        "shadow to sun (from hits)": (bo, sh_d, active),
    }

    print(f"scene: cornell {n_tris} tris leaf={args.leaf}, {n_wide} wide "
          f"nodes, {n} rays, tile_rows={tr}, "
          f"backend={jax.default_backend()}")
    print(f"model: VPU {VPU_LANES} lanes @ {CLOCK_GHZ} GHz; one (32,128) "
          f"vector op = {lanes // VPU_LANES} cycles")
    rows = []
    for name, (po, pd, pact) in pops.items():
        rec, stats = wk.trace_closest_wide_stats(
            wscene, po, pd, active=pact, tile_rows=tr
        )
        st = np.asarray(stats).astype(np.float64)
        dt = timed(
            lambda po=po, pd=pd, pact=pact: wk.trace_closest_wide(
                wscene, po, pd, active=pact, tile_rows=tr
            ),
            args.reps,
        )
        g = st.shape[0]
        nodes, leaves, rounds = st[:, 0].sum(), st[:, 1].sum(), st[:, 2].sum()
        live = (
            float(np.asarray(pact).sum()) if pact is not None else float(n)
        )
        mrays = n / dt / 1e6
        rows.append((name, g, nodes, leaves, rounds, dt, mrays, live))
        print(f"\n[{name}] {g} packets, live lanes {int(live)}")
        print(f"  nodes/packet   {nodes/g:8.1f}   (tree has {n_wide})")
        print(f"  leaves/packet  {leaves/g:8.1f}")
        print(f"  rounds/packet  {rounds/g:8.1f}")
        print(f"  trace          {dt*1e3:8.2f} ms  = {mrays:6.1f} Mrays/s "
              f"dispatched, {live/dt/1e6:6.1f} live")
        print(f"  per-packet     {dt/g*1e6:8.1f} us -> "
              f"{dt/max(nodes,1)*1e9:6.0f} ns/node+share, "
              f"us/leaf-share {dt/max(leaves,1)*1e6:6.2f}")

    # ---- fit the two-term cost model t = a*nodes + b*leaves (+ c*rounds)
    A = np.array([[r[2], r[3]] for r in rows])
    y = np.array([r[5] for r in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a_ns, b_ns = coef * 1e9
    print(f"\nfit: node visit ~= {a_ns:.0f} ns/packet, leaf row ~= "
          f"{b_ns:.0f} ns/packet (lstsq over the 3 populations)")

    # ---- per-ray ideal visits: XLA oracle walk instrumented on host is
    # expensive; approximate with single-lane packets = the union of ONE ray.
    # Sample: trace 4096 single rays as one packet each via tile slicing is
    # impractical; instead report the design ceiling at measured unions and
    # at /2 and /4 unions (what stronger sorting could plausibly reach).
    print("\nceilings for the 2-term model at the bounce population:")
    nb = rows[1]
    for shrink in (1, 2, 4):
        t_pkt = (nb[2] / nb[1] * a_ns + nb[3] / nb[1] * b_ns) / shrink
        mr = lanes / (t_pkt * 1e-9) / 1e6
        print(f"  unions/{shrink}: {t_pkt/1e3:7.1f} us/packet -> "
              f"{mr:7.1f} Mrays/s dispatched")


if __name__ == "__main__":
    main()
