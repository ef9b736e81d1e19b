"""Render the default 6-sphere scene to PNG (headless smoke driver).

Drives the PRODUCTION path: the Renderer class (full frame DAG with the
Pallas packet tracer where supported), the same path bench.py measures.

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
    ap.add_argument("--no-taau", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(
        spp=args.spp,
        max_depth=args.depth,
        enable_temporal_reuse=not args.no_restir_reuse,
        enable_spatial_reuse=not args.no_restir_reuse,
        rng_lock_noise=0 if args.lock_noise else 1,
        enable_taau=not args.no_taau,
    )
    r = Renderer(out_w=args.width, out_h=args.height, cfg=cfg)
    for frame in range(args.frames):
        t0 = time.time()
        packed = r.render()
        np.asarray(packed)  # force device sync for honest timing
        print(f"frame {frame}: {time.time() - t0:.3f}s")
    r.save_png(args.out)
    print(f"wrote {args.out} (pallas={r.pscene is not None}, "
          f"internal {r.in_w}x{r.in_h})")


if __name__ == "__main__":
    main()
