"""Op-level device-time profile of the production bench frame (real TPU).

Captures one traced render step with jax.profiler and aggregates
device-stream op durations by HLO/kernel name, so frame cost is attributed
to trace kernels vs XLA glue (gathers, sorts, restir, taau) with real
numbers instead of subtractive ablation.

Usage: python tools/frameprofile.py [--frames N] [--top K] [--spp S]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _parse_xplane(trace_dir: str):
    """Aggregate (op_name -> total device ns) from the captured xplane."""
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    totals = collections.Counter()
    device_total = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
            for line in plane.lines:
                # XLA op lines carry the per-op breakdown; step lines would
                # double-count
                lname = line.name.lower()
                if "xla op" not in lname and "xla ops" not in lname:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    # prefer the scope-qualified semantic op name (carries
                    # jax.named_scope paths like glue_sortperm/...) from the
                    # event stats over the bare HLO instruction name
                    for st in ev.stats:
                        k = stat_meta.get(st.metadata_id, "")
                        if k in ("tf_op", "tf_op_name", "op_name"):
                            v = st.str_value or stat_meta.get(
                                st.ref_value, ""
                            )
                            if v:
                                name = f"{v} [{name}]"
                            break
                    totals[name] += ev.duration_ps
                    device_total += ev.duration_ps
    return totals, device_total


def _bucket(name: str) -> str:
    n = name.lower()
    # semantic stages first: jax.named_scope paths riding the op_name stat
    for tag in ("glue_sortperm", "glue_sortgather", "glue_unsort",
                "glue_decode", "glue_restir", "glue_shade", "stage_taau",
                "stage_tonemap_pack", "stage_primary"):
        if tag in n and "custom-call" not in n and "custom_call" not in n:
            return tag
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas kernels"
    if "gather" in n or "scatter" in n:
        return "gathers/scatters"
    if "fusion" in n:
        return "xla fusions"
    if "copy" in n or "transpose" in n or "bitcast" in n:
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
    args = ap.parse_args()

    import jax

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(spp=args.spp, max_depth=args.depth,
                       use_pallas_trace=True)
    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=8, bvh_method="sah"
    )
    r = Renderer(out_w=1920, out_h=1080, cfg=cfg, scene=scene,
                 camera=cornell_camera(1920, 1080))
    r.sun_azimuth, r.sun_elevation = 0.3, 0.6
    np.asarray(r.render())  # compile+warm
    np.asarray(r.render())

    os.system(f"rm -rf {args.dir}")
    t0 = time.time()
    with jax.profiler.trace(args.dir):
        for _ in range(args.frames):
            np.asarray(r.render())
    wall = (time.time() - t0) / args.frames
    print(f"wall per presented frame: {wall*1e3:.0f} ms")

    totals, device_total = _parse_xplane(args.dir)
    per_frame = 1.0 / args.frames / 1e9  # ps -> ms per frame
    print(f"device total: {device_total*per_frame:.0f} ms/frame\n")

    buckets = collections.Counter()
    for name, ps in totals.items():
        buckets[_bucket(name)] += ps
    print("== buckets ==")
    for b, ps in buckets.most_common():
        print(f"  {b:22s} {ps*per_frame:9.1f} ms")

    print("\n== top ops ==")
    for name, ps in totals.most_common(args.top):
        print(f"  {ps*per_frame:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
