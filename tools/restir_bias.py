"""Measure the mean bias of ReSTIR reuse vs the candidates-only estimator.

Two scenes:
* default sphere scene (temporal, spatial, both);
* ideal case -- an unoccluded uniform lambert plane filling the view, where
  every neighbor is perfectly compatible and theory says reuse must be
  exactly mean-preserving.

Run with --reference to measure the reference's exact weighting
(RTRay.cs:407-435, 518-539); default measures our corrected estimator.
Findings recorded in the RenderConfig.restir_reference_weighting docstring:
the reference formula brightens direct light by ~+52% (default scene) and
~+163% (ideal plane); the corrected weighting is mean-preserving.

Usage: python tools/restir_bias.py [--reference] [--seeds N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--seeds", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.camera import Camera
    from ilgpu_raytracing_tpu.models.materials import Material
    from ilgpu_raytracing_tpu.models.scene import SceneBuilder, build_default_scene
    from ilgpu_raytracing_tpu.ops import integrator, restir, sky

    W, H, FRAMES = 48, 32, 3
    lum = np.array([0.2126, 0.7152, 0.0722], np.float32)

    def frame_sequence(scene, gb, cam, cfg, noise_key, frames):
        n = W * H
        sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
        ra = restir.Reservoirs.empty(n)
        rb = restir.Reservoirs.empty(n)
        color = None
        for f in range(frames):
            rp = ra if f % 2 == 0 else rb
            color, _, _, rc_out, _ = integrator.path_trace(
                scene, gb, cam, cam, rp, rb if f % 2 == 0 else ra, f,
                np.uint32(noise_key), sun, cfg, W, H,
            )
            if f % 2 == 0:
                rb = rc_out
            else:
                ra = rc_out
        return np.asarray(color, np.float32)

    def measure(scene, cam, label):
        kw = dict(spp=2, max_depth=1,
                  restir_reference_weighting=args.reference)
        cfgs = {
            "temporal": RenderConfig(enable_temporal_reuse=True,
                                     enable_spatial_reuse=False, **kw),
            "spatial": RenderConfig(enable_temporal_reuse=False,
                                    enable_spatial_reuse=True, **kw),
            "both": RenderConfig(enable_temporal_reuse=True,
                                 enable_spatial_reuse=True, **kw),
        }
        base_cfg = RenderConfig(enable_temporal_reuse=False,
                                enable_spatial_reuse=False, **kw)
        gb = integrator.primary_visibility(scene, cam, W, H)
        S = args.seeds
        base = np.zeros((S, W * H), np.float32)
        acc = {k: np.zeros((S, W * H), np.float32) for k in cfgs}
        for s in range(S):
            key = (s * 2654435761 + 1) & 0xFFFFFFFF
            base[s] = frame_sequence(scene, gb, cam, base_cfg, key ^ 0xA5A5, 1) @ lum
            for i, (k, cfg) in enumerate(cfgs.items()):
                acc[k][s] = frame_sequence(scene, gb, cam, cfg,
                                           key ^ (0x1111 * (i + 1)), FRAMES) @ lum
        mb = base.mean(0)
        lit = mb > 0.05
        print(f"-- {label} ({lit.sum()} lit px, {S} seeds, "
              f"{'reference' if args.reference else 'corrected'} weighting)")
        for k in cfgs:
            rel = (acc[k].mean(0)[lit] - mb[lit]) / mb[lit]
            print(f"  {k:8s} rel bias: mean {rel.mean():+.4f}  "
                  f"p95 {np.percentile(rel, 95):+.4f}  max {rel.max():+.4f}")

    _, scene = build_default_scene()
    measure(scene, Camera.create(W, H, 60.0), "default scene")

    b = SceneBuilder()
    b.add_material(Material(kd=(0.5, 0.5, 0.5)))
    b.add_sphere((0, -1000.5, 0), 1000.0, (0.5, 0.5, 0.5), 0)
    b.add_sphere_instance([0])
    plane = b.commit()
    cam = Camera.look_at((0, 1.5, 0), (0, -0.5, 0.02), (0, 0, 1), 30.0, 1.5)
    measure(plane, cam, "ideal plane")


if __name__ == "__main__":
    main()
