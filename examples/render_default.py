"""Render the default 6-sphere scene to PNG (headless smoke driver).

Usage:
  python examples/render_default.py --width 512 --height 512 --frames 3 \
      --out /tmp/frame.png [--cpu] [--spp 2] [--depth 3] [--no-restir-reuse]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", type=str, default="/tmp/frame.png")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--no-restir-reuse", action="store_true")
    ap.add_argument("--lock-noise", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.camera import Camera
    from ilgpu_raytracing_tpu.models.scene import build_default_scene
    from ilgpu_raytracing_tpu.ops import integrator, restir, sky
    from ilgpu_raytracing_tpu.utils import image

    cfg = RenderConfig(
        spp=args.spp,
        max_depth=args.depth,
        enable_temporal_reuse=not args.no_restir_reuse,
        enable_spatial_reuse=not args.no_restir_reuse,
    )
    w, h = args.width, args.height
    _, scene = build_default_scene()
    cam = Camera.create(w, h, 60.0).translate([1, 0, -4])
    prev_cam = cam

    res_a = restir.Reservoirs.empty(w * h)
    res_b = restir.Reservoirs.empty(w * h)
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)

    color = None
    for frame in range(args.frames):
        t0 = time.time()
        gb = integrator.primary_visibility(scene, cam, w, h)
        noise_key = np.uint32(
            0 if args.lock_noise else (frame * 2654435761 + 1) & 0xFFFFFFFF
        )
        res_prev, res_cur = (res_a, res_b) if frame % 2 == 0 else (res_b, res_a)
        color, depth, obj_id, res_cur = integrator.path_trace(
            scene, gb, cam, prev_cam, res_prev, res_cur, frame, noise_key,
            sun, cfg, w, h,
        )
        color.block_until_ready()
        if frame % 2 == 0:
            res_b = res_cur
        else:
            res_a = res_cur
        prev_cam = cam
        print(f"frame {frame}: {time.time() - t0:.3f}s")

    img = image.linear_to_uint8(
        np.asarray(color).reshape(h, w, 3)[::-1], srgb=False
    )  # flip: v axis points up
    image.save_png(args.out, img)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
