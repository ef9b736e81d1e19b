"""BASELINE config 5: ~1M-triangle terrain, 8-bounce path trace.

Renders the procedural large mesh (models/terrain.py) through the
production Renderer on the HBM-streaming traversal kernel
(ops/pallas/stream_kernel.py), with sorted/compacted bounce batches
(ops/sort.py). Multi-chip scaling is the same image-space sharding as
every other scene (parallel/sharding.py; see __graft_entry__).

Usage:
  python examples/large_mesh.py [--cpu] [--width W] [--height H]
      [--frames N] [--grid-x GX] [--grid-z GZ] [--out PNG]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--grid-x", type=int, default=1024)
    ap.add_argument("--grid-z", type=int, default=512)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--bvh", default="sah", choices=["sah", "lbvh", "median"])
    ap.add_argument("--leaf", type=int, default=64)
    ap.add_argument("--out", default="/tmp/large_mesh.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.terrain import (
        build_terrain_scene,
        terrain_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    t0 = time.time()
    _, scene = build_terrain_scene(
        grid_x=args.grid_x, grid_z=args.grid_z,
        blas_leaf_size=args.leaf, bvh_method=args.bvh,
    )
    n_tris = int(scene.tri_v0.shape[0])
    print(f"scene: {n_tris} tris, built in {time.time()-t0:.1f}s "
          f"({args.bvh} leaf={args.leaf})", flush=True)

    cfg = RenderConfig(spp=2, max_depth=args.max_depth)
    r = Renderer(
        out_w=args.width, out_h=args.height, cfg=cfg, scene=scene,
        camera=terrain_camera(args.width, args.height),
    )
    kind = type(r.pscene).__name__ if r.pscene is not None else "XLA"
    print(f"tracer: {kind}; scene-to-kernel-ready {time.time()-t0:.1f}s",
          flush=True)

    import numpy as np

    np.asarray(r.render())  # compile + sync
    t0 = time.time()
    for _ in range(args.frames):
        np.asarray(r.render())  # forced device->host sync per frame
    dt = (time.time() - t0) / args.frames
    rays = r.in_w * r.in_h * (1 + cfg.spp * cfg.max_depth * 2)
    print(f"{dt*1e3:.0f} ms/frame  {rays/dt/1e6:.2f} Mrays/s (dispatched)")
    r.save_png(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
