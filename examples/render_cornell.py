"""Render the procedural Cornell scene (BASELINE config 3: triangle mesh,
LBVH/SAH build + traversal, 800x600).

Usage: python examples/render_cornell.py [--cpu] [--bvh sah|median|lbvh]
       [--pallas] [--width 800 --height 600] [--frames 4] [--out out.png]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", type=str, default="/tmp/cornell.png")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bvh", type=str, default="sah",
                    choices=["median", "sah", "lbvh"])
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--tess", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(spp=2, max_depth=3, use_pallas_trace=args.pallas)
    _, scene = build_cornell_scene(
        tess=args.tess, blas_leaf_size=8, bvh_method=args.bvh
    )
    print(f"triangles: {scene.tri_v0.shape[0]} (bvh={args.bvh})")
    r = Renderer(
        out_w=args.width, out_h=args.height, cfg=cfg, scene=scene,
        camera=cornell_camera(args.width, args.height),
    )
    r.sun_azimuth, r.sun_elevation = 0.3, 0.6
    for f in range(args.frames):
        t0 = time.time()
        r.render()
        import numpy as np

        np.asarray(r._last_packed)
        print(f"frame {f}: {time.time() - t0:.3f}s")
    r.save_png(args.out)
    print("wrote", args.out, "|", r.hud.text)


if __name__ == "__main__":
    main()
