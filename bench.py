"""Benchmark: multi-bounce triangle-mesh path trace at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 200 Mrays/sec/chip (BASELINE.md / BASELINE.json north
star). Rays are counted as dispatched trace lanes -- 1 primary visibility
ray + (1 scatter + 1 shadow) per sample per bounce per pixel -- the
wavefront occupancy accounting (masked lanes hold SIMD slots on TPU).

Scene: procedural Cornell box + tessellated sphere (~36k triangles, one
mesh BLAS), 1920x1080 internal resolution, spp=2, max_depth=3, ReSTIR
temporal+spatial reuse on. Timing forces a device->host transfer of the
packed framebuffer each frame (block_until_ready is unreliable on the
tunneled axon backend); the transfer (~2 MB) is part of the presented-frame
cost, as in the reference's PBO path.
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
    from ilgpu_raytracing_tpu.ops import integrator, sky
    from ilgpu_raytracing_tpu.ops.restir import Reservoirs
    from ilgpu_raytracing_tpu.utils import packing

    width, height = 1920, 1080
    cfg = RenderConfig(spp=2, max_depth=3, max_ray_pixels=width * height)
    _, scene = build_cornell_scene(tess=24, sphere_tess=(48, 72))
    n_tris = scene.tri_v0.shape[0]
    cam = cornell_camera(width, height)
    sun = sky.sun_direction(0.3, 0.6)
    n = width * height
    res_a = Reservoirs.empty(n)
    res_b = Reservoirs.empty(n)

    @jax.jit
    def frame(frame_idx, noise_key, res_prev, res_cur):
        gb = integrator.primary_visibility(
            scene, cam, width, height, cfg.chunk_pixels
        )
        color, depth, obj, res_out = integrator.path_trace(
            scene, gb, cam, cam, res_prev, res_cur, frame_idx, noise_key,
            sun, cfg, width, height,
        )
        return color, res_out

    # pack in a separate jit: fusing the pack into the trace pipeline
    # SIGILLs the TPU fusion cost model (XLA remote-compiler bug; see
    # .claude/skills/verify/SKILL.md notes)
    pack = jax.jit(packing.pack_rgba8)

    # warmup / compile
    color, res_b = frame(np.uint32(0), np.uint32(1), res_a, res_b)
    packed = pack(color)
    _ = np.asarray(packed)

    n_frames = 5
    t0 = time.time()
    for f in range(1, n_frames + 1):
        rp, rc = (res_b, res_a) if f % 2 else (res_a, res_b)
        color, rc = frame(
            np.uint32(f), np.uint32(f * 2654435761 & 0xFFFFFFFF), rp, rc
        )
        if f % 2:
            res_a = rc
        else:
            res_b = rc
        _ = np.asarray(pack(color))  # force sync (see module docstring)
    dt = time.time() - t0

    rays_per_frame = n * (1 + cfg.spp * cfg.max_depth * 2)
    mrays = rays_per_frame * n_frames / dt / 1e6
    fps = n_frames / dt
    result = {
        "metric": "mrays_per_sec_1080p_cornell_path_trace",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 200.0, 4),
        "detail": {
            "fps_1080p": round(fps, 3),
            "tris": int(n_tris),
            "spp": cfg.spp,
            "max_depth": cfg.max_depth,
            "frames": n_frames,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
