"""Render configuration.

The reference hard-codes every knob as scattered consts (see SURVEY.md section
5 "Config / flag system"); here the exact knob set is lifted into one frozen
dataclass. Defaults reproduce the reference's defaults, with every
divergence documented at the knob with its measurement: the execution-shape
knobs (sorting, dedup, pallas kernels) change no pixel; the estimator knobs
that do (restir_reference_weighting -- a reference bias NOT replicated;
rr_start_depth -- the reference's RR gate is dead code, fixed per SURVEY
section 7; shadow_rr_lum -- visibility-ray RR, measured net noise-efficiency
win) each carry their reference-exact setting in the comment.

Reference citations for each default:
  render_scale=0.67          RTRenderer.cs:43
  enable_taau=True           RTRenderer.cs:44
  enable_temporal_reuse      RTRenderer.cs:46
  enable_spatial_reuse       RTRenderer.cs:47
  rng_lock_noise=1 (animated)RTRenderer.cs:48 (0 = locked/frame-invariant)
  spp=2                      RTRenderer.cs:49
  max_depth=3                RTRenderer.cs:204
  sun defaults               RTRenderer.cs:59-61, 174-178, 192
  sky tints                  RTRenderer.cs:193-194
  local/delta candidates     RTRay.cs:443-444
  restir compat thresholds   RTRay.cs:362-374
  eps_n (normal offset)      RTRay.cs:185
  taa feedback/sharp/clamp   RTTaa.cs:77-79
  max_ray_pixels/min_rt_dim  RTWindow.cs:50-51
  blas_leaf=4 / tlas_leaf=2  Scene.cs:436, 486
  rr gate depth>=3, clamp    RTRay.cs:306-311
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # --- resolution policy ---
    render_scale: float = 0.67
    max_ray_pixels: int = 1_000_000
    min_rt_dim: int = 64

    # --- integrator ---
    spp: int = 2
    max_depth: int = 3
    eps_n: float = 0.0025
    eps_min: float = 1e-6
    # Divergence from the reference, prescribed by SURVEY.md section 7
    # step 3: the reference's Russian roulette is DEAD CODE at its own
    # defaults (gate depth>=3 with MaxDepth=3, so depth only reaches 0..2
    # -- RTRay.cs:306-311 vs RTRenderer.cs:204). Default 2 makes RR live
    # at the final bounce: measured -3.3% bench frame at 1.01-1.03x
    # variance, means preserved (BENCHLOG round 5 "estimator RR
    # campaign"). Set 3 to reproduce the reference's dead gate exactly.
    rr_start_depth: int = 2
    rr_clamp_lo: float = 0.05
    rr_clamp_hi: float = 0.98
    safe_color_max: float = 1e6

    # --- ReSTIR DI ---
    enable_restir: bool = True
    enable_temporal_reuse: bool = True
    enable_spatial_reuse: bool = True
    local_candidates: int = 8
    delta_candidates: int = 1
    compat_normal_dot: float = 0.85
    compat_depth_rel: float = 0.05
    # True reproduces the reference's exact reuse weighting
    # (RTRay.cs:407-435, 518-539), which is measurably biased: its final
    # shading divides f/pdfSel by the stored *score*, a combination that
    # cancels to an unbiased RIS estimator for fresh candidates but not for
    # imported ones (the imported sample is RIS-distributed, not
    # cos-distributed). Measured +52% mean direct lighting on the default
    # scene, +163% on an ideal uniform plane (tools/restir_bias.py). The
    # default (False) stores the target value s_hat(y) in the reservoir and
    # shades with f * wSum / (m * s_hat), which is mean-preserving
    # (tests/test_restir_stats.py) and identical to the reference on the
    # candidates-only path.
    restir_reference_weighting: bool = False

    # --- tracing ---
    # Reorder bounce-trace batches by (alive, direction octant) around the
    # packet kernel (ops/sort.py): measured 1.8x on scatter-ray traversal
    # (v5e), a few ms of counting-sort + two packed row gathers per trace.
    sort_bounce_rays: bool = True
    # Refine the sort key with 2 bits/axis of the quantized ray ORIGIN
    # below the octant: bounce/shadow origins are scattered hit points, so
    # spatial grouping halves packet traversal unions (measured: bounce-2
    # closest 345->197 ms, mixed shadow 270->135 ms at 1.8M lanes on v5e,
    # for ~20 ms of extra radix-pass glue per trace). Per-lane results are
    # order-independent; this only changes packet composition.
    sort_origin_morton: bool = True
    # HBM-streaming scenes only: replace the origin-morton minor key with
    # the DESTINATION treelet -- the subtree AABB the ray's slab entry
    # reaches first (models/bvh.cut_scene_treelets rides StreamScene as
    # sortkey_bounds). Measured at 1M tris (v5e, 1.8M bounce lanes,
    # tools/streamkey_ab.py): bounce closest 946->817 ms (1.16x), sun
    # shadow 200->145 ms (1.38x), equal perm-build cost. Ordering only;
    # results are bit-identical under any key.
    sort_stream_treelet_key: bool = True
    # Trace bounce-0 sun occlusion once per frame (coherent, sample-
    # invariant) instead of inside every sample's shadow batch.
    dedup_sun_shadow: bool = True
    # Defer every bounce's ReSTIR visibility rays (plus the final bounce's
    # sky-visibility any-hit) into ONE frame-wide shadow dispatch traced
    # after the bounce loop. Sound because shadow results only scale the
    # radiance contribution, never path continuation or reservoir writes
    # (RTRay.cs:518-539: visibility multiplies the contribution after
    # selection). Collapses max_depth+1 sorted shadow round-trips into one
    # at (max_depth+1)x the lane count; radiance is equal up to fp
    # summation order. Applies on the pure Pallas path only (the XLA /
    # alpha-peel tracers wrap while_loops whose lane count must stay
    # bounded; see integrator._path_trace_block).
    deferred_shadows: bool = False
    # Russian roulette on VISIBILITY rays (rebuild-only knob, 0.0 = off =
    # reference parity, RTRay.cs:518-539 always traces the winner): a
    # shadow lane whose potential contribution luminance c is below this
    # threshold traces with probability p = clip(c/threshold, pmin, 1) and
    # scales its contribution by 1/p -- an unbiased estimator change
    # (E[(c/p)*V*survive] = c*V), applied to every ReSTIR winner
    # visibility ray and the final bounce's sky-visibility ray. Skipped
    # lanes count as occluded. Cuts the sorted shadow batches' live-lane
    # population (the frame's #1 kernel bucket); variance cost is bounded
    # and measured in BENCHLOG round 5.
    # Default 0.3: measured -2 to -3% bench frame at 1.01-1.02x variance
    # (noise efficiency 0.985, a net win -- BENCHLOG round 5); 0.0
    # restores the reference's always-trace behavior bit-exactly (the RR
    # draw is a side-stream, utils/rng.side_float, so main streams never
    # shift). Raise toward 1.0 for fps-chasing modes (-14% frame at
    # 1.35x variance on cornell).
    shadow_rr_lum: float = 0.3
    shadow_rr_pmin: float = 0.05
    # Lane layout of the spp-vectorized trace batch: False = sample-major
    # ([sample0 pixels; sample1 pixels]), True = pixel-major (a pixel's spp
    # lanes adjacent). Pixel-major keeps a pixel's samples adjacent through
    # the stable (alive, octant, morton) sort whenever they share a key
    # bin, so their overlapping leaf wants land in the same subtile (the
    # round-4 memo's "spp amortization" route). Pure lane permutation:
    # per-(pixel, sample) RNG streams, trace results, and fold order are
    # unchanged -- images are bit-identical under either layout.
    spp_pixel_major: bool = False

    # --- RNG ---
    # 0 => locked (frame-invariant noise); nonzero => distinct stream selector /
    # animated noise (a fresh value per frame). Mirrors rngLockNoise semantics.
    rng_lock_noise: int = 1
    rng_salt: int = 0xC0FFEE

    # --- lights ---
    sun_azimuth: float = 0.0
    sun_elevation: float = 0.9
    sun_speed_rad_per_sec: float = 0.0
    sun_radiance: tuple[float, float, float] = (10.0, 10.0, 10.0)
    sky_tint_top: tuple[float, float, float] = (0.5, 0.7, 1.0)
    sky_tint_bottom: tuple[float, float, float] = (1.0, 1.0, 1.0)

    # --- TAAU ---
    enable_taau: bool = True
    taa_feedback: float = 0.075
    taa_sharpness: float = 0.10
    # NOTE: the reference's clampK knob (RTTaa.cs:79) is dead code there --
    # computed but never applied to the blend (RTTaa.cs:189-190). It is
    # deliberately NOT replicated here; the 3x3 min/max clamp in ops/taa.py
    # is the live behavior on both sides.

    # --- BVH build ---
    blas_leaf_size: int = 4
    tlas_leaf_size: int = 2

    # --- execution shape ---
    # Use the Pallas packet-traversal kernel for closest-hit/shadow rays on
    # scenes it supports (VMEM-resident, no alpha maps); falls back to the
    # XLA while-loop tracer otherwise. Default ON: besides being faster, the
    # XLA tracer exhibits a TPU-specific numeric artifact (distance-banded
    # visibility rings -- approximate-reciprocal lowering in the slab/MT
    # math under the platform's excess-precision flags) that the Mosaic
    # kernel does not. CPU execution of the XLA tracer is clean; it remains
    # the correctness oracle and the alpha-cutout / huge-scene path.
    use_pallas_trace: bool = True

    # Escape hatch for the guard in Renderer._prepare_pscene: by default a
    # TPU render whose scene no Pallas kernel supports (e.g. >4M triangles)
    # raises instead of silently routing to the XLA while-loop tracer,
    # which on TPU both ring-artifacts (ARCHITECTURE.md finding 8) and
    # SIGILLs above ~1M lanes (finding 6). Set True to accept those risks
    # (CPU backends are unaffected -- the XLA tracer is clean there).
    allow_xla_tracer_on_tpu: bool = False

    # Pixel batches larger than this are processed in equal chunks via
    # lax.map inside the integrator: bounds compile-unit size and peak
    # memory (and works around a TPU fusion-pass crash on >1M-pixel
    # while-loop graphs). Just under that crash threshold so a 1080p frame
    # (901k internal pixels) runs unchunked -- fewer, larger fusions and one
    # bounce-ray sort per trace instead of two. 0 disables chunking.
    chunk_pixels: int = 1000000

    # --- progressive accumulation (rebuild-only capability; BASELINE config 4) ---
    progressive_accumulation: bool = False

    def internal_resolution(self, out_w: int, out_h: int) -> tuple[int, int]:
        """Internal RT resolution: render_scale per axis, capped at
        max_ray_pixels total and min_rt_dim per axis (RTWindow.cs:334-342 +
        RTRenderer.cs:113-116 semantics)."""
        w = max(1, int(round(out_w * self.render_scale)))
        h = max(1, int(round(out_h * self.render_scale)))
        # cap at max_ray_pixels, preserving aspect (RTWindow.ComputeInternalRT)
        if w * h > self.max_ray_pixels:
            s = (self.max_ray_pixels / float(w * h)) ** 0.5
            w = max(self.min_rt_dim, int(w * s))
            h = max(self.min_rt_dim, int(h * s))
        w = max(self.min_rt_dim if min(out_w, out_h) >= self.min_rt_dim else 1, w)
        h = max(self.min_rt_dim if min(out_w, out_h) >= self.min_rt_dim else 1, h)
        # Round down to 64-pixel block multiples so the frame runs in the
        # packet-coherent block-linear layout (ops/layout.py). Divergence
        # from the reference's exact-scale policy, documented: the internal
        # resolution may be up to 63 px smaller per axis.
        if w >= 64 and h >= 64:
            w -= w % 64
            h -= h % 64
        return w, h
