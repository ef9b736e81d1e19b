"""Device-time profile of the treelet rounds trace vs the flat dispatch.

Answers round-4's question: the A/B ladder says each visit round costs
~30 ms even when its kernel does almost nothing -- which ops carry it?
Reuses frameprofile's xplane parser.

Usage: python tools/treelet_profile.py [--treelets 32] [--variant rounds]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from frameprofile import _parse_xplane


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--treelets", type=int, default=32)
    ap.add_argument("--variant", default="rounds",
                    choices=["rounds", "single", "flat"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dir", default="/tmp/jax-trace-treelet")
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

    hit = wk.trace_closest_wide(wscene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    bo_l, bd_l, act_l = [], [], []
    for s in range(2):
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

    bmin = jnp.min(scene.inst_bmin, axis=0)
    bmax = jnp.max(scene.inst_bmax, axis=0)
    mb = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))

    if args.variant == "rounds":
        fn = jax.jit(lambda: treelet_mod.trace_closest_treelet_packed(
            ts, bo, bd, active=active))
    elif args.variant == "single":
        fn = jax.jit(lambda: treelet_mod.trace_closest_treelet_single(
            ts, bo, bd, active=active))
    else:
        fn = jax.jit(lambda: sort_mod.sorted_closest_packed(
            lambda oo, dd, a: wk.trace_closest_wide_packed(
                wscene, oo, dd, active=a),
            lambda t, pp: wk.decode_wide_hits(wscene, bo, bd, t, pp),
            bo, bd, active, mb))

    np.asarray(fn()[0])  # compile + warm
    os.system(f"rm -rf {args.dir}")
    with jax.profiler.trace(args.dir):
        np.asarray(fn()[0])

    totals, async_totals, device_total = _parse_xplane(args.dir)
    print(f"sync device total: {device_total/1e9:.1f} ms")

    # group by op family (strip .N suffixes)
    fam = collections.Counter()
    cnt = collections.Counter()
    for name, ps in totals.items():
        base = name.split(" =")[0].lstrip("%").rstrip("0123456789.")
        fam[base] += ps
        cnt[base] += 1
    print("\n== op families ==")
    for b, ps in fam.most_common(args.top):
        print(f"  {ps/1e9:8.2f} ms  x{cnt[b]:<4d} {b[:80]}")


if __name__ == "__main__":
    main()
