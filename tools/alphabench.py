"""TPU perf on textured + alpha-cutout content (round-4 verdict weak #6).

Benches the sponza_like courtyard (map_Kd diffuse + map_d perforated
banners through the REAL obj/mtl parser) at BASELINE config-3 shape
(800x600) on the production path: the alpha peel (ops/alpha.py) around the
opaque Pallas kernel. The control arm is the SAME scene tables with
has_alpha=False (banners opaque, peel disabled) so the delta is purely the
peel machinery. Interleaved A/B pairs, per-arm minima (drift-immune).

Also reports per-population peel-iteration counts (the loop's executed
trip count): primary visibility and a frame-realistic bounce-scatter
batch -- if the peel were pathological (iterations ~ surface count), it
shows here first.

Usage: python tools/alphabench.py [--pairs 6] [--width 800 --height 600]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.sponza_like import (
        build_sponza_like_scene, sponza_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    with tempfile.TemporaryDirectory() as d:
        _, scene = build_sponza_like_scene(d, blas_leaf_size=8)
    assert scene.has_alpha
    print(f"[scene] sponza_like: {int(scene.tri_v0.shape[0])} tris, "
          f"{int(scene.tex_offset.shape[0])} textures", flush=True)

    cfg = RenderConfig(spp=args.spp, max_depth=args.depth,
                       use_pallas_trace=True)
    cam = sponza_camera(args.width, args.height)
    arms = {
        "alpha (peel)": scene,
        "opaque ctrl ": scene.replace(has_alpha=False),
    }
    rends = {}
    for name, sc in arms.items():
        r = Renderer(out_w=args.width, out_h=args.height, cfg=cfg,
                     scene=sc, camera=cam)
        r.sun_azimuth, r.sun_elevation = 0.3, 0.6
        print(f"[warm] {name} compiling...", flush=True)
        np.asarray(r.render())
        np.asarray(r.render())
        rends[name] = r

    times: dict[str, list[float]] = {k: [] for k in rends}
    for _ in range(args.pairs):
        for name, r in rends.items():
            t0 = time.time()
            np.asarray(r.render())
            times[name].append(time.time() - t0)

    print(f"\nsponza_like {args.width}x{args.height} spp={args.spp} "
          f"depth={args.depth}, {args.pairs} interleaved pairs:")
    stats = {}
    for name, ts in times.items():
        r = rends[name]
        lanes = (r.in_w * r.in_h) * (1 + 2 * args.spp * args.depth)
        eff = float(np.asarray(r._last_aux["eff_rays"]))
        mn, md = min(ts), sorted(ts)[len(ts) // 2]
        stats[name] = mn
        print(f"  {name}  min {mn*1e3:8.1f} ms  median {md*1e3:8.1f} ms  "
              f"({lanes/mn/1e6:6.2f} Mrays/s disp, {eff/mn/1e6:5.2f} eff)")
    a, b = stats.values()
    print(f"  peel multiplier: {a/b:.2f}x over opaque control")

    # ---- peel iteration counts per population ----
    from ilgpu_raytracing_tpu.ops import alpha as alpha_ops
    from ilgpu_raytracing_tpu.ops import rays as rays_mod
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.utils import rng as rng_mod

    r = rends["alpha (peel)"]
    w, h = r.in_w, r.in_h
    n = w * h
    ws = wk.prepare_wide(tk.prepare(scene))
    closest = lambda oo, dd, act: wk.trace_closest_wide(ws, oo, dd, active=act)
    cam_in = sponza_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam_in, u, v)
    hit, iters_p = alpha_ops.trace_closest_peel(
        closest, scene, o, d, with_iters=True
    )
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    bo = surf.pos + surf.normal * 1e-3
    _, iters_b = alpha_ops.trace_closest_peel(
        closest, scene, bo, scat, active=hit.hit, with_iters=True
    )
    sun = jnp.asarray([0.35, 0.8, 0.49]) / np.linalg.norm([0.35, 0.8, 0.49])
    sd = jnp.broadcast_to(sun, (n, 3))
    _, iters_s = alpha_ops.shadow_occlusion_peel(
        closest, scene, bo, sd, 1e29, active=hit.hit, with_iters=True
    )
    print(f"  peel iterations (= opaque-kernel dispatches per trace): "
          f"primary {int(iters_p)}, bounce scatter {int(iters_b)}, "
          f"sun shadow {int(iters_s)} (cap {alpha_ops.MAX_PEELS})")


if __name__ == "__main__":
    main()
