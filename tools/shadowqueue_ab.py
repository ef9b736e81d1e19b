"""A/B: deferred frame-wide shadow queue vs inline per-bounce shadow traces.

Round-5 verdict item: the bench frame's #1 kernel bucket is the 4 shadow
dispatches (318 ms) + their share of the sort machinery; visibility rays
never drive path continuation (RTRay.cs:518-539), so all of them can ride
ONE sorted dispatch after the bounce loop (config.deferred_shadows).

Protocol (drift-immune, round-4 verdict weak #4): both arms compiled and
warmed in one process, then strictly INTERLEAVED A/B/A/B frame pairs; the
reported statistic is the per-arm MINIMUM (host drift is additive noise,
the min tracks the clean frame) plus medians for context. Running order
cannot change the ranking because every pair sees the same drift state.

Usage: python tools/shadowqueue_ab.py [--pairs 8] [--scene cornell|terrain]
       [--width 1920 --height 1080]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "terrain"])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="also assert image equivalence (adds 2 frames)")
    args = ap.parse_args()

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    if args.scene == "cornell":
        from ilgpu_raytracing_tpu.models.cornell import (
            build_cornell_scene, cornell_camera,
        )

        _, scene = build_cornell_scene(
            tess=24, sphere_tess=(48, 72), blas_leaf_size=8,
            bvh_method="sah",
        )
        cam = cornell_camera(args.width, args.height)
    else:
        from ilgpu_raytracing_tpu.models.terrain import build_terrain_scene

        _, scene = build_terrain_scene(1_000_000, blas_leaf_size=64)
        cam = None

    base = RenderConfig(spp=args.spp, max_depth=args.depth,
                        use_pallas_trace=True)
    arms = {
        "inline  ": dataclasses.replace(base, deferred_shadows=False),
        "deferred": dataclasses.replace(base, deferred_shadows=True),
    }

    rends = {}
    for name, cfg in arms.items():
        r = Renderer(out_w=args.width, out_h=args.height, cfg=cfg,
                     scene=scene, camera=cam)
        r.sun_azimuth, r.sun_elevation = 0.3, 0.6
        print(f"[warm] {name} compiling...", flush=True)
        np.asarray(r.render())
        np.asarray(r.render())
        rends[name] = r

    if args.check:
        imgs = {}
        for name, r in rends.items():
            # fresh deterministic frame: reset state, locked noise
            r.cfg = dataclasses.replace(r.cfg, rng_lock_noise=0)
            r.resize(args.width, args.height)
            np.asarray(r.render())
            imgs[name] = np.asarray(r._last_aux["color"])
        a, b = list(imgs.values())
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
        print(f"[check] max rel diff {rel.max():.2e} "
              f"(fp summation order only)")
        assert rel.max() < 1e-3, "deferred queue changed the image"
        for r in rends.values():
            r.cfg = dataclasses.replace(r.cfg, rng_lock_noise=1)

    times: dict[str, list[float]] = {k: [] for k in rends}
    for p in range(args.pairs):
        for name, r in rends.items():
            t0 = time.time()
            np.asarray(r.render())
            times[name].append(time.time() - t0)
        if p == 0:
            print("[run] interleaving...", flush=True)

    n_rays = None
    print(f"\nscene={args.scene} {args.width}x{args.height} "
          f"spp={args.spp} depth={args.depth}, {args.pairs} interleaved "
          f"pairs, per-frame sync (device+present serialized):")
    for name, ts in times.items():
        r = rends[name]
        eff = float(np.asarray(r._last_aux["eff_rays"]))
        lanes = (r.in_w * r.in_h) * (1 + 2 * args.spp * args.depth)
        n_rays = lanes
        mn, md = min(ts), sorted(ts)[len(ts) // 2]
        print(f"  {name}  min {mn*1e3:8.1f} ms  median {md*1e3:8.1f} ms  "
              f"({lanes/mn/1e6:6.2f} Mrays/s disp at min, "
              f"{eff/mn/1e6:5.2f} eff)")
    print(f"  per-frame order: {['/'.join(f'{t*1e3:.0f}' for t in pair) for pair in zip(*times.values())]}")


if __name__ == "__main__":
    main()
