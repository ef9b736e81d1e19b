"""ReSTIR candidate-count A/B (round-3 verdict item 7).

The reference hardcodes 8 local + 1 delta candidates (RTRay.cs:443-444).
With temporal+spatial reuse carrying effective sample mass across frames,
fewer fresh candidates may buy the same image quality for less frame
time. This tool measures, per scene class:

  part A (--variance, forced CPU): per-pixel luminance variance across
    independent seeds of a reuse-warmed frame, at 8+1 / 4+1 / 2+1;
  part B (--frametime, real TPU): presented bench-frame time at the same
    counts (cornell 1080p protocol, min of 2x6-frame windows).

Decision metric: noise efficiency = variance x frame-time (the cost of
reaching a fixed accumulated RMSE is proportional to it for an unbiased
estimator under frame accumulation).

Usage:
  python tools/restir_candidates_ab.py --variance   (CPU, ~10 min)
  python tools/restir_candidates_ab.py --frametime  (TPU, exclusive)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

W, H = 48, 32
SEEDS = 16
WARM_FRAMES = 3

SCENE_LIGHTING = {
    "default": dict(spp=2, max_depth=1),
    "cornell": dict(spp=2, max_depth=1, sun_azimuth=0.3, sun_elevation=0.6),
    "canyon": dict(
        spp=2, max_depth=1,
        sun_azimuth=float(np.pi), sun_elevation=0.25,
        sun_radiance=(6.0, 6.0, 6.0),
        sky_tint_top=(4.0, 4.2, 4.5),
        sky_tint_bottom=(0.02, 0.02, 0.03),
    ),
}


def _build(scene_name):
    if scene_name == "default":
        from ilgpu_raytracing_tpu.models.camera import Camera
        from ilgpu_raytracing_tpu.models.scene import build_default_scene

        _, scene = build_default_scene(single_instance=True)
        return scene, Camera.create(W, H, 60.0)
    if scene_name == "cornell":
        from ilgpu_raytracing_tpu.models.cornell import (
            build_cornell_scene,
            cornell_camera,
        )

        _, scene = build_cornell_scene(tess=8, sphere_tess=(12, 16))
        return scene, cornell_camera(W, H)
    from ilgpu_raytracing_tpu.models.canyon import (
        build_canyon_scene,
        canyon_camera,
    )

    _, scene = build_canyon_scene()
    return scene, canyon_camera(W, H)


def _frame_sequence(scene, gb, cam, cfg, noise_key, frames):
    from ilgpu_raytracing_tpu.ops import integrator, restir, sky

    n = W * H
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    ra = restir.Reservoirs.empty(n)
    rb = restir.Reservoirs.empty(n)
    color = None
    for f in range(frames):
        rp, rc = (ra, rb) if f % 2 == 0 else (rb, ra)
        color, _, _, rc_out, _ = integrator.path_trace(
            scene, gb, cam, cam, rp, rc, f, np.uint32(noise_key), sun,
            cfg, W, H,
        )
        if f % 2 == 0:
            rb = rc_out
        else:
            ra = rc_out
    return np.asarray(color, np.float32)


def run_variance():
    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.ops import integrator

    lum = np.array([0.2126, 0.7152, 0.0722], np.float32)
    print(f"variance across {SEEDS} seeds, {W}x{H}, reuse on, "
          f"{WARM_FRAMES} warm frames:")
    for scene_name, lighting in SCENE_LIGHTING.items():
        scene, cam = _build(scene_name)
        gb = integrator.primary_visibility(scene, cam, W, H)
        line = f"  {scene_name:8s}"
        base_var = None
        for c in (8, 4, 2):
            cfg = RenderConfig(
                local_candidates=c,
                enable_temporal_reuse=True, enable_spatial_reuse=True,
                **lighting,
            )
            frames = np.zeros((SEEDS, W * H), np.float32)
            for s in range(SEEDS):
                key = (s * 2654435761 + 1) & 0xFFFFFFFF
                frames[s] = _frame_sequence(
                    scene, gb, cam, cfg, key, WARM_FRAMES
                ) @ lum
            v = frames.var(axis=0, ddof=1)
            lit = frames.mean(axis=0) > 1e-5
            mv = float(v[lit].mean())
            if base_var is None:
                base_var = mv
            line += f"  c={c}: {mv:.5f} ({mv/base_var:5.2f}x)"
        print(line, flush=True)


def run_frametime(pairs: int = 8):
    """Drift-immune protocol (round-4 verdict weak #4): every arm's
    renderer is compiled and warmed up front, then the arms are timed in
    strictly INTERLEAVED rotation (8,4,2,8,4,2,...) so process-cumulative
    host drift hits every arm equally; the per-arm statistic is the
    MINIMUM (drift is additive noise -- the min tracks the clean frame).
    Run order of the rotation cannot change the per-arm minima ranking;
    pass --counts reversed to verify."""
    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    rends = {}
    for c in _COUNTS:
        cfg = RenderConfig(spp=2, max_depth=3, local_candidates=c)
        r = Renderer(out_w=1920, out_h=1080, cfg=cfg, scene=scene,
                     camera=cornell_camera(1920, 1080))
        r.sun_azimuth, r.sun_elevation = 0.3, 0.6
        print(f"[warm] c={c} compiling...", flush=True)
        np.asarray(r.render())
        np.asarray(r.render())
        rends[c] = r
    times: dict[int, list[float]] = {c: [] for c in _COUNTS}
    for _ in range(pairs):
        for c, r in rends.items():
            t0 = time.time()
            np.asarray(r.render())
            times[c].append(time.time() - t0)
    print(f"bench frame (cornell 1080p presented, spp=2 depth=3), "
          f"{pairs} interleaved rounds, rotation order {_COUNTS}:")
    for c, ts in times.items():
        mn, md = min(ts), sorted(ts)[len(ts) // 2]
        print(f"  c={c}: min {mn*1e3:7.1f} ms  median {md*1e3:7.1f} ms  "
              f"per-round {['%.0f' % (t*1e3) for t in ts]}", flush=True)


_COUNTS = (8, 4, 2)


def main():
    global _COUNTS
    ap = argparse.ArgumentParser()
    ap.add_argument("--variance", action="store_true")
    ap.add_argument("--frametime", action="store_true")
    ap.add_argument("--counts", default="8,4,2",
                    help="candidate counts, comma-separated (order = run "
                         "order; reversing isolates process-cumulative "
                         "slowdown from the count effect)")
    args = ap.parse_args()
    _COUNTS = tuple(int(c) for c in args.counts.split(","))

    import jax

    if args.variance:
        jax.config.update("jax_platforms", "cpu")
        run_variance()
    if args.frametime:
        run_frametime()


if __name__ == "__main__":
    main()
