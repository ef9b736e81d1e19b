"""Subtractive full-frame profile on the real TPU.

Times the production frame at several config ablations to locate where the
frame time lives. One process, one scene, results printed as a table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import dataclasses

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    out_w, out_h = 1920, 1080
    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )

    base = RenderConfig(spp=2, max_depth=3, use_pallas_trace=True)
    variants = [
        ("full frame", base),
        ("no taau", dataclasses.replace(base, enable_taau=False)),
        ("no reuse", dataclasses.replace(
            base, enable_temporal_reuse=False, enable_spatial_reuse=False)),
        ("depth=1", dataclasses.replace(base, max_depth=1)),
        ("depth=2", dataclasses.replace(base, max_depth=2)),
        ("spp=1", dataclasses.replace(base, spp=1)),
        ("spp=1 depth=1 no reuse no taau", dataclasses.replace(
            base, spp=1, max_depth=1, enable_taau=False,
            enable_temporal_reuse=False, enable_spatial_reuse=False)),
    ]

    for name, cfg in variants:
        r = Renderer(
            out_w=out_w, out_h=out_h, cfg=cfg, scene=scene,
            camera=cornell_camera(out_w, out_h),
        )
        r.sun_azimuth, r.sun_elevation = 0.3, 0.6
        np.asarray(r.render())  # compile+warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            packed = r.render()
            np.asarray(packed)
        dt = (time.time() - t0) / reps
        print(f"{name:34s} {dt*1e3:9.1f} ms/frame")


if __name__ == "__main__":
    main()
