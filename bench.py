"""Benchmark: multi-bounce triangle-mesh path trace, 1080p presented frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 200 Mrays/sec/chip (BASELINE.md north star).

The measured frame is the reference-faithful 1080p pipeline: internal
tracing at 0.67x per axis capped at 1M ray-pixels (the reference's own
resolution policy, RTWindow.cs:50-51 + RTRenderer.cs:43) -> ReSTIR path
trace (spp=2, 3 bounces) -> TAAU upsample to 1920x1080, through the full
Renderer frame step. The headline value counts DISPATCHED trace lanes at
internal resolution (1 primary + (1 scatter + 1 shadow) per sample per
bounce per pixel); `detail.mrays_effective` counts only lanes that were
actually alive when traced (terminated paths and pixels without a selected
light sample excluded), as measured in-graph by the integrator. Timing
forces a device->host transfer of the packed 1080p framebuffer each frame
(block_until_ready is unreliable on the tunneled axon backend); the ~8 MB
transfer is part of the presented-frame cost, as the PBO copy is in the
reference.

Scene: procedural Cornell box + tessellated sphere (15,552 triangles at
tess=24, one mesh BLAS, native SAH build).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    out_w, out_h = 1920, 1080
    cfg = RenderConfig(spp=2, max_depth=3, use_pallas_trace=True)
    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    n_tris = int(scene.tri_v0.shape[0])
    r = Renderer(
        out_w=out_w,
        out_h=out_h,
        cfg=cfg,
        scene=scene,
        camera=cornell_camera(out_w, out_h),
    )
    r.sun_azimuth, r.sun_elevation = 0.3, 0.6

    # warmup / compile
    packed = r.render()
    _ = np.asarray(packed)

    # pipelined present: dispatch frame N, then fetch frame N-1's packed
    # framebuffer while N computes on-device (the reference's GL present is
    # likewise asynchronous to the next frame's kernels). Every frame is
    # still fully transferred to the host; the tunnel's ~70 ms 8 MB fetch
    # just overlaps device work instead of serializing after it.
    #
    # De-noised protocol (round 4): 3 windows x 6 frames, report the MIN
    # window. Host weather (the 1-core container's erratic dispatch) only
    # ever ADDS time, so the min window is the honest device number and
    # round-over-round deltas outrun the +-2-4% single-window variance band
    # (BENCHLOG.md round-3 A/B ranges).
    n_windows, win_frames = 3, 6
    win_dts = []
    for _ in range(n_windows):
        prev = None
        t0 = time.time()
        for _ in range(win_frames):
            cur = r.render()
            if prev is not None:
                _ = np.asarray(prev)
            prev = cur
        _ = np.asarray(prev)  # drain the last frame (forces full sync)
        win_dts.append(time.time() - t0)
    dt = min(win_dts)
    n_frames = win_frames

    in_n = r.in_w * r.in_h
    rays_per_frame = in_n * (1 + cfg.spp * cfg.max_depth * 2)
    eff_rays_per_frame = float(np.asarray(r._last_aux["eff_rays"]))
    mrays = rays_per_frame * n_frames / dt / 1e6
    mrays_eff = eff_rays_per_frame * n_frames / dt / 1e6
    fps = n_frames / dt
    result = {
        "metric": "mrays_per_sec_1080p_cornell_path_trace",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 200.0, 4),
        "vs_baseline_effective": round(mrays_eff / 200.0, 4),
        "detail": {
            "fps_1080p_presented": round(fps, 3),
            "mrays_effective": round(mrays_eff, 2),
            "window_s": [round(x, 3) for x in win_dts],
            "rays_dispatched_per_frame": rays_per_frame,
            "rays_effective_per_frame": int(eff_rays_per_frame),
            "internal_res": [r.in_w, r.in_h],
            "tris": n_tris,
            "spp": cfg.spp,
            "max_depth": cfg.max_depth,
            "frames": n_frames,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
