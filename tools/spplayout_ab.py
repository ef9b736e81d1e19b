"""A/B: spp lane layout -- sample-major vs pixel-major (spp amortization).

Round-3 roofline memo's second escape route: share walk work across a
pixel's spp samples. On a packet machine that means CO-LOCATION -- a
pixel's spp lanes adjacent in the pre-sort order stay adjacent through the
stable (alive, octant, morton) sort whenever they share a key bin, so
their overlapping leaf wants land in the same subtile and the gated drain
pays once (config.spp_pixel_major). Images are bit-identical under either
layout (pure lane permutation; verified here before timing).

Protocol: both arms compiled+warmed in one process, strictly interleaved
A/B pairs, per-arm minima (drift-immune; round-4 verdict weak #4).

Usage: python tools/spplayout_ab.py [--pairs 8] [--scene cornell|terrain]
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
    ap.add_argument("--deferred", action="store_true",
                    help="run both arms with the deferred shadow queue")
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
                        use_pallas_trace=True,
                        deferred_shadows=args.deferred)
    arms = {
        "sample-major": dataclasses.replace(base, spp_pixel_major=False),
        "pixel-major ": dataclasses.replace(base, spp_pixel_major=True),
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

    # bit-exactness: fresh deterministic frame per arm
    imgs = {}
    for name, r in rends.items():
        r.cfg = dataclasses.replace(r.cfg, rng_lock_noise=0)
        r.resize(args.width, args.height)
        np.asarray(r.render())
        imgs[name] = np.asarray(r._last_aux["color"])
        r.cfg = dataclasses.replace(r.cfg, rng_lock_noise=1)
    a, b = list(imgs.values())
    exact = np.array_equal(a, b)
    print(f"[check] images bit-identical: {exact}")
    if not exact:
        bad = np.abs(a - b).max()
        print(f"[check] MAX ABS DIFF {bad:.3e} -- layout changed values, "
              "A/B invalid", flush=True)
        sys.exit(1)

    times: dict[str, list[float]] = {k: [] for k in rends}
    for _ in range(args.pairs):
        for name, r in rends.items():
            t0 = time.time()
            np.asarray(r.render())
            times[name].append(time.time() - t0)

    print(f"\nscene={args.scene} {args.width}x{args.height} spp={args.spp} "
          f"depth={args.depth} deferred={args.deferred}, {args.pairs} "
          f"interleaved pairs:")
    for name, ts in times.items():
        r = rends[name]
        lanes = (r.in_w * r.in_h) * (1 + 2 * args.spp * args.depth)
        mn, md = min(ts), sorted(ts)[len(ts) // 2]
        print(f"  {name}  min {mn*1e3:8.1f} ms  median {md*1e3:8.1f} ms  "
              f"({lanes/mn/1e6:6.2f} Mrays/s disp at min)")


if __name__ == "__main__":
    main()
