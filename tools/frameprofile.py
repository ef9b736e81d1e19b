"""Op-level device-time profile of the production bench frame (real TPU).

Captures one traced render step with jax.profiler and aggregates
device-stream op durations by HLO/kernel name, so frame cost is attributed
to trace kernels vs XLA glue (gathers, sorts, restir, taau) with real
numbers instead of subtractive ablation.

Two attribution fixes (round 4):
* the xplane's "Async XLA Ops" line holds span events (slice-start /
  copy-start DMAs) whose duration is the WALL SPAN until the matching
  -done -- they overlap kernels and double-count if summed with the sync
  op line. They are reported separately, not added to the device total.
* jax.named_scope paths (glue_sortperm / stage_taau / ...) do not reach
  the xplane at all; they live in the compiled HLO's per-instruction
  metadata={op_name=...}. The tool AOT-compiles the same frame step and
  regex-joins instruction names -> scope tags for semantic bucketing.

Usage: python tools/frameprofile.py [--frames N] [--top K] [--spp S]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCOPE_TAGS = (
    "glue_sortperm", "glue_sortgather", "glue_unsort", "glue_decode",
    "glue_restir", "glue_shade", "glue_shadowqueue", "stage_taau",
    "stage_tonemap_pack", "stage_primary",
)


def _parse_xplane(trace_dir: str):
    """(sync op totals, async span totals, sync device total) in ps."""
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    async_totals = collections.Counter()
    device_total = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name.lower()
                if "xla op" not in lname:
                    continue
                is_async = "async" in lname
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    if is_async:
                        async_totals[name] += ev.duration_ps
                    else:
                        totals[name] += ev.duration_ps
                        device_total += ev.duration_ps
    return totals, async_totals, device_total


_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _hlo_scope_map(hlo_text: str) -> dict[str, str]:
    """instruction name -> first SCOPE_TAG found in its op_name metadata."""
    out: dict[str, str] = {}
    for ln in hlo_text.splitlines():
        if "op_name=" not in ln:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        op = _OPNAME_RE.search(ln)
        if not op:
            continue
        for tag in SCOPE_TAGS:
            if tag in op.group(1):
                out[m.group(1)] = tag
                break
    return out


def _instr_of(event_name: str) -> str:
    """'%fusion.21 = s32[...] ...' -> 'fusion.21'."""
    m = _INSTR_RE.match(event_name)
    return m.group(1) if m else event_name


def _bucket(name: str, scope_map: dict[str, str]) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        if "counting_pos" in n:
            return "glue_sortperm (counting_pos kernel)"
        return "pallas trace kernels"
    tag = scope_map.get(_instr_of(name))
    if tag:
        return tag
    if "gather" in n or "scatter" in n:
        return "gathers/scatters (unattributed)"
    if "fusion" in n:
        return "xla fusions (unattributed)"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "copies/layout"
    if "while" in n or "conditional" in n:
        return "control flow"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/jax-trace-frame")
    ap.add_argument("--skip-capture", action="store_true",
                    help="re-bucket an existing trace dir")
    ap.add_argument("--deferred", action="store_true",
                    help="profile the deferred-shadow-queue frame")
    ap.add_argument("--pixel-major", action="store_true",
                    help="profile the pixel-major spp lane layout")
    args = ap.parse_args()

    import jax

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.ops import sky
    from ilgpu_raytracing_tpu.runtime import renderer as renderer_mod
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(spp=args.spp, max_depth=args.depth,
                       use_pallas_trace=True,
                       deferred_shadows=args.deferred,
                       spp_pixel_major=args.pixel_major)
    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    r = Renderer(out_w=1920, out_h=1080, cfg=cfg, scene=scene,
                 camera=cornell_camera(1920, 1080))
    r.sun_azimuth, r.sun_elevation = 0.3, 0.6
    np.asarray(r.render())  # compile+warm
    np.asarray(r.render())

    if not args.skip_capture:
        os.system(f"rm -rf {args.dir}")
        t0 = time.time()
        with jax.profiler.trace(args.dir):
            for _ in range(args.frames):
                np.asarray(r.render())
        wall = (time.time() - t0) / args.frames
        print(f"wall per presented frame: {wall*1e3:.0f} ms", flush=True)

    # AOT-lower the same frame step and pull per-instruction scope metadata
    # from the optimized module (hits the compile cache set by the warm run)
    sun_dir = sky.sun_direction(r.sun_azimuth, r.sun_elevation)
    lowered = renderer_mod.render_frame.lower(
        r.scene, r.camera, r.prev_camera, r.state, np.uint32(r.frame),
        np.uint32(0), sun_dir, np.bool_(False), r.cfg, r.in_w, r.in_h,
        r.out_w, r.out_h, r.tonemap_name, r.pscene,
    )
    try:
        hlo_text = lowered.compile().as_text()
    except Exception as e:  # pragma: no cover
        print(f"(scope map unavailable: {e})")
        hlo_text = ""
    scope_map = _hlo_scope_map(hlo_text)
    print(f"scope map: {len(scope_map)} instructions tagged", flush=True)

    totals, async_totals, device_total = _parse_xplane(args.dir)
    per_frame = 1.0 / args.frames / 1e9  # ps -> ms per frame
    print(f"sync device total: {device_total*per_frame:.0f} ms/frame")
    async_total = sum(async_totals.values())
    print(f"async span total (overlaps compute, NOT additive): "
          f"{async_total*per_frame:.0f} ms/frame\n")

    buckets = collections.Counter()
    for name, ps in totals.items():
        buckets[_bucket(name, scope_map)] += ps
    print("== buckets (sync stream) ==")
    for b, ps in buckets.most_common():
        print(f"  {b:38s} {ps*per_frame:9.1f} ms")

    print("\n== top sync ops ==")
    for name, ps in totals.most_common(args.top):
        tag = scope_map.get(_instr_of(name), "")
        print(f"  {ps*per_frame:8.2f} ms  [{tag:14s}] {name[:96]}")

    print("\n== top async spans ==")
    for name, ps in async_totals.most_common(12):
        print(f"  {ps*per_frame:8.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
