"""Visibility-ray Russian roulette A/B (config.shadow_rr_lum, round 5).

The bench frame's #1 kernel bucket is the sorted shadow dispatches
(318 ms of 945, BENCHLOG round 4). shadow_rr_lum skips low-contribution
visibility rays with probability 1-p and scales survivors by 1/p --
unbiased by construction; what needs MEASURING is (a) how many lanes
actually die at a given threshold (the time win) and (b) the variance
cost (the quality price). Protocol mirrors the drift-immune rules:
interleaved arms, per-arm minima.

  part A (--variance, forced CPU): per-pixel luminance variance across
    independent seeds of a reuse-warmed frame at several thresholds;
  part B (--frametime, real TPU): cornell 1080p bench frame, interleaved
    rotation over thresholds, per-arm minima + effective-ray counts
    (eff drops exactly by the RR-killed lane count).

Usage:
  python tools/shadowrr_ab.py --variance
  python tools/shadowrr_ab.py --frametime
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
THRESHOLDS = (0.0, 0.1, 0.3, 1.0)

# arms for the combined estimator A/B (--arms): label -> config overrides.
# rr2 makes path Russian roulette LIVE at the final bounce (the reference
# gates RR at depth>=3 with MaxDepth=3, i.e. dead code, RTRay.cs:306-311
# vs RTRenderer.cs:204; SURVEY.md section 7 step 3 calls for fixing that
# by an effective-depth gate). srr is the visibility-ray RR above.
ARMS = {
    "base       ": dict(),
    "srr=0.3    ": dict(shadow_rr_lum=0.3),
    "rr2        ": dict(rr_start_depth=2),
    "rr2+srr=0.3": dict(rr_start_depth=2, shadow_rr_lum=0.3),
}


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


def run_variance(arms: dict[str, dict]):
    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene, cornell_camera,
    )
    from ilgpu_raytracing_tpu.models.scene import build_default_scene
    from ilgpu_raytracing_tpu.models.camera import Camera
    from ilgpu_raytracing_tpu.ops import integrator

    lum = np.array([0.2126, 0.7152, 0.0722], np.float32)
    scenes = {}
    _, sc = build_default_scene(single_instance=True)
    scenes["default"] = (sc, Camera.create(W, H, 60.0), {})
    _, sc = build_cornell_scene(tess=8, sphere_tess=(12, 16))
    scenes["cornell"] = (
        sc, cornell_camera(W, H),
        dict(sun_azimuth=0.3, sun_elevation=0.6),
    )
    print(f"variance across {SEEDS} seeds, {W}x{H}, reuse on, "
          f"{WARM_FRAMES} warm frames, mean preservation checked:")
    for name, (scene, cam, lighting) in scenes.items():
        gb = integrator.primary_visibility(scene, cam, W, H)
        line = f"  {name:8s}"
        base_var = base_mean = None
        for label, overrides in arms.items():
            cfg = RenderConfig(
                spp=2, max_depth=3,
                enable_temporal_reuse=True, enable_spatial_reuse=True,
                **lighting, **overrides,
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
            mm = float(frames.mean())
            if base_var is None:
                base_var, base_mean = mv, mm
            line += (f"  {label.strip()}: var {mv/base_var:5.2f}x "
                     f"mean {(mm/base_mean - 1.0)*100:+.2f}%")
        print(line, flush=True)


def run_frametime(arms: dict[str, dict], pairs: int = 8):
    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene, cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    rends = {}
    for label, overrides in arms.items():
        cfg = RenderConfig(spp=2, max_depth=3, **overrides)
        r = Renderer(out_w=1920, out_h=1080, cfg=cfg, scene=scene,
                     camera=cornell_camera(1920, 1080))
        r.sun_azimuth, r.sun_elevation = 0.3, 0.6
        print(f"[warm] {label.strip()} compiling...", flush=True)
        np.asarray(r.render())
        np.asarray(r.render())
        rends[label] = r
    times: dict[str, list[float]] = {label: [] for label in arms}
    for _ in range(pairs):
        for label, r in rends.items():
            t0 = time.time()
            np.asarray(r.render())
            times[label].append(time.time() - t0)
    print(f"bench frame (cornell 1080p presented, spp=2 depth=3), "
          f"{pairs} interleaved rounds:")
    base_eff = None
    for label, ts in times.items():
        r = rends[label]
        eff = float(np.asarray(r._last_aux["eff_rays"]))
        if base_eff is None:
            base_eff = eff
        mn, md = min(ts), sorted(ts)[len(ts) // 2]
        print(f"  {label}: min {mn*1e3:7.1f} ms  median {md*1e3:7.1f} ms  "
              f"eff {eff/1e6:6.2f}M ({eff/base_eff:5.1%} of base)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variance", action="store_true")
    ap.add_argument("--frametime", action="store_true")
    ap.add_argument("--arms", action="store_true",
                    help="run the combined estimator arms (path RR at the "
                         "final bounce, visibility RR) instead of the "
                         "shadow_rr_lum threshold ladder")
    ap.add_argument("--pairs", type=int, default=8)
    args = ap.parse_args()

    arms = ARMS if args.arms else {
        f"t={t:<9g}": dict(shadow_rr_lum=t) for t in THRESHOLDS
    }

    import jax

    if args.variance:
        jax.config.update("jax_platforms", "cpu")
        run_variance(arms)
    if args.frametime:
        run_frametime(arms, args.pairs)


if __name__ == "__main__":
    main()
