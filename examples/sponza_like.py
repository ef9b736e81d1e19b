"""Sponza-class demo: procedural multi-material OBJ courtyard with MTL,
tiled diffuse textures, and alpha-cutout banners, through the production
Renderer (Pallas packet kernels + alpha peeling on TPU).

Usage:
  python examples/sponza_like.py [--cpu] [--width W] [--height H]
      [--frames N] [--out PNG]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="/tmp/sponza_like.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.sponza_like import (
        build_sponza_like_scene,
        sponza_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    with tempfile.TemporaryDirectory() as d:
        _, scene = build_sponza_like_scene(d)
    print(f"scene: {int(scene.tri_v0.shape[0])} tris, "
          f"{int(scene.mat_kd.shape[0])} materials, alpha={scene.has_alpha}")

    cfg = RenderConfig(spp=2, max_depth=3, sun_azimuth=0.4, sun_elevation=0.9)
    r = Renderer(
        out_w=args.width, out_h=args.height, cfg=cfg, scene=scene,
        camera=sponza_camera(args.width, args.height),
    )
    r.render_frames(1)
    t0 = time.time()
    r.render_frames(args.frames)
    print(f"{(time.time()-t0)/args.frames*1e3:.0f} ms/frame")
    r.save_png(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
