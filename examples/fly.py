"""Human-drivable fly-camera session in a live tk window.

The TPU analog of running the reference app (Program.cs -> RTWindow): a
tkinter window presents frames and pumps real keyboard/mouse events into
the fly camera. Controls match the reference (RTWindow.cs:255-314,
CameraController.cs:35-70): WASD + Space/C move, mouse look while captured,
E toggles capture, scroll zooms FOV, Shift x4 / Ctrl x0.25 speed, Escape
quits.

Usage: python examples/fly.py [--cpu] [--width 640] [--height 360]
Requires a DISPLAY; exits with a message when headless.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cornell", action="store_true")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.runtime.interactive import (
        InteractiveSession,
        TkInputWindow,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    win = TkInputWindow.open(args.width, args.height)
    if win is None:
        print("no display available (set DISPLAY or use X forwarding)")
        return 1

    cfg = RenderConfig(spp=args.spp, max_depth=args.depth)
    scene = None
    camera = None
    if args.cornell:
        from ilgpu_raytracing_tpu.models.cornell import (
            build_cornell_scene,
            cornell_camera,
        )

        _, scene = build_cornell_scene(tess=12, sphere_tess=(24, 36))
        camera = cornell_camera(args.width, args.height)
    r = Renderer(
        out_w=args.width, out_h=args.height, cfg=cfg, scene=scene,
        camera=camera,
    )
    try:
        frames = InteractiveSession(
            r, win.input_provider, win.presenter
        ).run()
    finally:
        win.destroy()
    print(f"{frames} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
