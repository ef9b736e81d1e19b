"""Wavefront path-trace integrator.

Restructures the reference's per-pixel megakernel (reference
RTRay.cs:203-325) into a TPU-native wavefront over flat SoA pixel batches:

* `primary_visibility` -- one batched trace + deferred shading fills the
  G-buffer (the reference's PrimaryVisibilityKernel, RTRay.cs:188-201);
* `path_trace` -- spp and bounce loops are `lax.scan`s over the whole batch;
  each bounce issues exactly ONE batched closest-hit trace (the scattered
  rays of all material lanes together) and ONE batched shadow trace (the
  ReSTIR-selected samples), instead of per-thread divergent branches. All
  material branches (mirror / glass / lambert, RTRay.cs:235-317) are computed
  as masked lane updates and combined with selects.

Algorithmic parity notes:
* ReSTIR DI with temporal + prev-frame spatial reuse runs at the first
  diffuse vertex; deeper diffuse vertices run candidates-only RIS and do not
  write the reservoir (RTRay.cs:277-298).
* Russian roulette gates on `depth >= rr_start_depth` with throughput clamp
  [0.05, 0.98] (RTRay.cs:306-311). NOTE: with the reference's defaults
  (max_depth=3) this is dead code there (SURVEY.md known-quirks); here it is
  live for deeper configs.
* Per-sample NaN/Inf scrub (SafeColor, RTRay.cs:645-655).
* Frame-state flow is pure: reservoirs ping-pong through the return value
  instead of mutable SoA buffers, which makes the reference's
  write-m-last / read-prev-only race conventions unrepresentable
  (SURVEY.md section 5 "race detection").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.materials import (
    SHADING_GLASS,
    SHADING_LAMBERT,
    SHADING_MIRROR,
)
from ilgpu_raytracing_tpu.models.scene import SceneData
from ilgpu_raytracing_tpu.ops import alpha as alpha_ops
from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.ops import rays as rays_mod
from ilgpu_raytracing_tpu.ops import restir as restir_mod
from ilgpu_raytracing_tpu.ops import sky as sky_ops
from ilgpu_raytracing_tpu.ops import sort as sort_mod
from ilgpu_raytracing_tpu.ops import traverse
from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as pallas_sk
from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as pallas_tk
from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as pallas_wk
from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
from ilgpu_raytracing_tpu.utils import rng as rng_mod
from ilgpu_raytracing_tpu.utils import vec


@struct.dataclass
class GBuffer:
    """Primary-visibility surface attributes, flat (N,) SoA
    (reference GpuGBuffer, RTRay.cs:80-109, with unpacked material fields)."""

    pos: jnp.ndarray  # (N,3) world position (origin + 1e6*dir on miss)
    normal: jnp.ndarray  # (N,3)
    albedo: jnp.ndarray  # (N,3)
    shading: jnp.ndarray  # (N,) i32 (-1 on miss)
    ior: jnp.ndarray  # (N,)
    obj_id: jnp.ndarray  # (N,) i32 disocclusion key
    hit: jnp.ndarray  # (N,) bool


def _pick_n_chunks(n: int, target: int) -> int:
    """Smallest divisor count keeping chunks <= target (1 = no chunking)."""
    if target <= 0 or n <= target:
        return 1
    c = -(-n // target)
    while c <= 256:
        if n % c == 0:
            return c
        c += 1
    return 1


def _trace_fns(pscene):
    if isinstance(pscene, pallas_wk.WideScene):
        return pallas_wk.trace_closest_wide, pallas_wk.shadow_occlusion_wide
    if isinstance(pscene, pallas_sk.StreamScene):
        return pallas_sk.trace_closest_stream, pallas_sk.shadow_occlusion_stream
    return pallas_tk.trace_closest_pallas, pallas_tk.shadow_occlusion_pallas


def _trace(scene, pscene, o, d, active=None, sort=False, morton_bounds=None,
           treelet_bounds=None):
    """Closest-hit dispatch: pallas packet kernel (8-wide or binary) when a
    prepared scene is supplied, XLA while-loop tracer otherwise. Primary
    batches arrive coherent in the frame's static block-linear order
    (ops/layout.py); bounce batches pass sort=True to reorder by
    (alive, direction octant) around the kernel (ops/sort.py), which cuts
    the packet node/leaf-visit unions ~1.8x on scatter rays. Alpha-cutout
    scenes peel around the opaque kernel (ops/alpha.py) instead of falling
    back to the XLA tracer."""
    if pscene is None:
        return traverse.trace_closest(scene, o, d, active=active)

    closest, _ = _trace_fns(pscene)
    kw = {}
    if scene.has_alpha:
        def run(oo, dd, act):
            return alpha_ops.trace_closest_peel(
                lambda o3, d3, a: closest(pscene, o3, d3, active=a, **kw),
                scene, oo, dd, act,
            )
    else:
        def run(oo, dd, act):
            return closest(pscene, oo, dd, active=act, **kw)
    if sort and active is not None:
        if not scene.has_alpha and isinstance(
            pscene, (pallas_wk.WideScene, pallas_sk.StreamScene)
        ):
            # packed fast path: un-permute only (t, prim|inst) and run the
            # barycentric decode epilogue in original lane order against
            # the caller's o/d (saves 4 of 6 unsort-gather columns)
            if isinstance(pscene, pallas_wk.WideScene):
                packed, decode = (pallas_wk.trace_closest_wide_packed,
                                  pallas_wk.decode_wide_hits)
            else:
                packed, decode = (pallas_sk.trace_closest_stream_packed,
                                  pallas_sk.decode_stream_hits)
            return sort_mod.sorted_closest_packed(
                lambda oo, dd, act: packed(pscene, oo, dd, active=act),
                lambda t, pp: decode(pscene, o, d, t, pp),
                o, d, active, morton_bounds, treelet_bounds,
            )
        return sort_mod.sorted_closest(run, o, d, active, morton_bounds,
                                       treelet_bounds)
    return run(o, d, active)


def _shadow(scene, pscene, o, d, t_max, active=None, sort=False,
            morton_bounds=None, treelet_bounds=None):
    if pscene is None:
        return traverse.shadow_occlusion(scene, o, d, t_max, active=active)
    kw = {}
    if scene.has_alpha:
        closest, _ = _trace_fns(pscene)

        def run(oo, dd, act):
            return alpha_ops.shadow_occlusion_peel(
                lambda o3, d3, a: closest(pscene, o3, d3, active=a, **kw),
                scene, oo, dd, t_max, act,
            )
    else:
        _, shadow = _trace_fns(pscene)

        def run(oo, dd, act):
            return shadow(pscene, oo, dd, t_max, active=act, **kw)
    if sort and active is not None:
        # the sorted wrapper permutes o/d/active but `run` closes over t_max
        # unsorted; a per-lane t_max would pair sorted rays with other
        # lanes' limits. All call sites pass a scalar today -- keep it so.
        assert jnp.ndim(t_max) == 0, (
            "sorted shadow path requires a scalar t_max (per-lane t_max "
            "would need to ride the sort permutation; see ops/sort.py)"
        )
        return sort_mod.sorted_shadow(run, o, d, active, morton_bounds,
                                      treelet_bounds)
    return run(o, d, active)


@partial(jax.jit, static_argnames=("width", "height", "chunk_pixels"))
def primary_visibility(
    scene: SceneData, camera, width: int, height: int, chunk_pixels: int = 0,
    pscene=None,
) -> GBuffer:
    n = width * height

    def block(u, v):
        o, d = rays_mod.generate_rays(camera, u, v)
        hit = _trace(scene, pscene, o, d)
        surf = traverse.shade_hits(scene, hit, o, d)
        return GBuffer(
            pos=surf.pos,
            normal=surf.normal,
            albedo=surf.albedo,
            shading=surf.shading,
            ior=surf.ior,
            obj_id=surf.obj_id,
            hit=hit.hit,
        )

    u, v = rays_mod.pixel_centers(width, height)
    c = _pick_n_chunks(n, chunk_pixels)
    if c == 1:
        return block(u, v)
    m = n // c
    out = lax.map(lambda uv: block(uv[0], uv[1]), (u.reshape(c, m), v.reshape(c, m)))
    return jax.tree_util.tree_map(lambda x: x.reshape(n, *x.shape[2:]), out)


def _offset_origin(pos, n, d, eps):
    """Normal-offset ray origin (MakeRayWithNormalOffset, RTRay.cs:552-558)."""
    s = jnp.where(vec.dot(n, d) >= 0.0, 1.0, -1.0)
    return pos + n * (eps * s)[..., None]


def _merge_reservoirs(dst, src, mask):
    mrg1 = lambda a, b: jnp.where(mask, b, a)
    mrg3 = lambda a, b: jnp.where(mask[..., None], b, a)
    return restir_mod.Reservoirs(
        L=mrg3(dst.L, src.L),
        wi=mrg3(dst.wi, src.wi),
        pdf=mrg1(dst.pdf, src.pdf),
        w=mrg1(dst.w, src.w),
        w_sum=mrg1(dst.w_sum, src.w_sum),
        m=mrg1(dst.m, src.m),
        light_id=mrg1(dst.light_id, src.light_id),
        W=mrg1(dst.W, src.W),
    )


def _path_trace_block(
    scene: SceneData,
    gb_full: GBuffer,
    gb: GBuffer,
    pixel_idx,
    camera,
    prev_camera,
    res_prev: restir_mod.Reservoirs,
    res_cur_init: restir_mod.Reservoirs,
    frame,
    noise_key,
    sun_dir,
    cfg: RenderConfig,
    width: int,
    height: int,
    pscene=None,
):
    """Path-trace one chunk of pixels. `gb`/`res_cur_init` are the chunk's
    own slices; `gb_full`/`res_prev` stay full-image because ReSTIR's
    temporal/spatial reuse gathers from arbitrary neighbor pixels.

    Round-3 restructure: ALL spp samples are vectorized into one
    (spp*m,) lane batch (was: lax.scan over samples). Every bounce issues
    exactly ONE batched closest trace and ONE batched shadow trace carrying
    every sample's rays, so the packet kernels see spp-times larger batches
    whose (alive, octant)-sorted packets pack alive lanes ACROSS samples
    (deep bounces keep packets fuller), and per-launch glue (sort keys,
    pad/reshape, selection shading) is paid once per bounce instead of once
    per sample-bounce. Bounce-0 ReSTIR spatial rows are fetched once per
    pixel and tiled across samples (restir_direct reps=spp). Bounces unroll
    as a Python loop: with samples vectorized the batch exceeds 1M lanes at
    1080p and while-loop graphs that large crash the TPU fusion pass
    (ARCHITECTURE.md finding 6); unrolled glue has no such cliff.

    Parity: lane (s*m + i) carries exactly the old sample-s RNG stream for
    pixel i; the per-sample NaN/Inf scrub and the reservoir write order
    (later samples overwrite earlier winners) are reproduced by slicing the
    (spp, m) lanes and folding in sample order.
    """
    m = pixel_idx.shape[0]
    spp = max(1, cfg.spp)
    n = spp * m  # total trace lanes
    cam_origin = jnp.asarray(camera.origin, jnp.float32)
    sky_top = cfg.sky_tint_top
    sky_bottom = cfg.sky_tint_bottom
    sun_radiance = cfg.sun_radiance

    # scene-bounds quantization for the origin-Morton sort-key refinement
    # (ops/sort.py): bounce-ray origins are hit points, so grouping packets
    # by scene region halves their traversal unions (measured 1.8-2.2x on
    # the bounce closest / shadow kernels at 1.8M lanes, v5e).
    morton_bounds = None
    if cfg.sort_bounce_rays and cfg.sort_origin_morton:
        bmin = jnp.min(scene.inst_bmin, axis=0)
        bmax = jnp.max(scene.inst_bmax, axis=0)
        morton_bounds = (bmin, 1.0 / jnp.maximum(bmax - bmin, 1e-6))
    # HBM-streaming scenes: destination-treelet minor key instead of
    # origin-morton (config.sort_stream_treelet_key; measured 1.16x closest
    # / 1.38x shadow at 1M tris, BENCHLOG round 4)
    treelet_bounds = None
    if (
        cfg.sort_bounce_rays
        and cfg.sort_stream_treelet_key
        and isinstance(pscene, pallas_sk.StreamScene)
        and pscene.sortkey_bounds is not None
    ):
        treelet_bounds = pscene.sortkey_bounds

    # lane layout (config.spp_pixel_major): sample-major stacks whole
    # sample tiles ([all pixels sample 0; all pixels sample 1]);
    # pixel-major interleaves so a pixel's spp lanes are adjacent and stay
    # adjacent through the stable sort when they share a key bin
    pixel_major = cfg.spp_pixel_major and spp > 1

    def tile(x):
        if pixel_major:
            return jnp.repeat(x, spp, axis=0)
        return jnp.tile(x, (spp,) + (1,) * (x.ndim - 1))

    px, py = layout.xy_from_position(pixel_idx, width, height)
    pu = (px.astype(jnp.float32) + 0.5) / float(max(1, width))
    pv = (py.astype(jnp.float32) + 0.5) / float(max(1, height))
    _, primary_d = rays_mod.generate_rays(camera, pu, pv)
    miss_sky = tile(sky_ops.sky_radiance(primary_d, sky_top, sky_bottom))

    gb_px = gb
    gb = jax.tree_util.tree_map(tile, gb)  # per-lane view of the chunk
    pixel_idx = tile(pixel_idx)

    view_i = vec.normalize(gb.pos - cam_origin)  # ViewDirFromCam (RTRay.cs:156)

    def _glass_ior(ior):
        # ior <= 0 falls back to 1.5 (RTRay.cs:251-252)
        return jnp.where(ior > 0.0, ior, 1.5)

    # deferred shadow queue (config.deferred_shadows): visibility rays
    # never drive path continuation or reservoir writes, so every bounce's
    # ReSTIR shadow batch (and the final bounce's sky-visibility any-hit)
    # can be accumulated and traced as ONE frame-wide sorted dispatch after
    # the bounce loop -- one sort/unsort round-trip instead of
    # max_depth+1. Pure-Pallas scenes only: the XLA-tracer and alpha-peel
    # paths wrap lax.while_loop whose lane count is chunk-bounded, and a
    # (max_depth+1)x batch would blow that bound (TPU fusion-pass crash,
    # ARCHITECTURE.md finding 6).
    defer_shadows = (
        cfg.deferred_shadows and pscene is not None and not scene.has_alpha
    )
    shadow_queue: list[dict] | None = [] if defer_shadows else None

    # visibility-ray Russian roulette (config.shadow_rr_lum; rebuild-only
    # estimator knob, 0 = off = reference parity). The draw is a
    # side-stream of the lane's CURRENT rng state (utils/rng.side_float),
    # so turning the knob on never shifts the main per-lane streams:
    # scatter directions, ReSTIR candidates, and path RR are identical,
    # and an A/B differs only on RR-killed visibility lanes.
    _lum_w = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)

    def _vis_rr(state, contrib_rgb, act, salt):
        """Returns (traced_mask, scale): survivors of `act` trace and
        scale their contribution by 1/p; scale is None when off."""
        if cfg.shadow_rr_lum <= 0.0:
            return act, None
        c = jnp.maximum(contrib_rgb @ _lum_w, 0.0)
        p = jnp.clip(
            c * (1.0 / cfg.shadow_rr_lum), cfg.shadow_rr_pmin, 1.0
        )
        u = rng_mod.side_float(state, salt)
        return act & (u < p), jnp.where(u < p, 1.0 / p, 0.0)

    def bounce_step(carry, depth, allow_reuse: bool, sun_occ0=None,
                    sun_dir_n=None, final: bool = False):
        (pos, nrm, alb, shade, ior, thr, li, alive, view, state, wrote,
         res_cur, eff) = carry

        is_mirror = alive & (shade == SHADING_MIRROR)
        is_glass = alive & (shade == SHADING_GLASS)
        is_lambert = alive & (shade == SHADING_LAMBERT)

        # ---- mirror branch (RTRay.cs:235-244) ----
        dir_mirror = vec.reflect(view, nrm)

        # ---- glass branch (RTRay.cs:246-275) ----
        outside = vec.dot(view, nrm) < 0.0
        n_use = jnp.where(outside[..., None], nrm, -nrm)
        eta_i = jnp.where(outside, 1.0, _glass_ior(ior))
        eta_t = jnp.where(outside, _glass_ior(ior), 1.0)
        dir_refl = vec.reflect(view, n_use)
        refr_ok, dir_refr = vec.refract(view, n_use, eta_i, eta_t)
        cos_i = jnp.abs(vec.dot(view, n_use))
        fresnel = vec.schlick_fresnel(cos_i, eta_i, eta_t)
        state, xi = rng_mod.next_float(state)
        choose_refl = (~refr_ok) | (xi < fresnel)
        dir_glass = jnp.where(choose_refl[..., None], dir_refl, dir_refr)
        offn_glass = jnp.where(choose_refl[..., None], n_use, -n_use)
        alb_black = jnp.all(alb == 0.0, axis=-1)
        trans_tint = jnp.where(alb_black[..., None], 1.0, alb)
        eta_scale = (eta_i * eta_i) / (eta_t * eta_t)
        thr_glass_mult = jnp.where(
            choose_refl[..., None], 1.0, trans_tint * eta_scale[..., None]
        )

        # ---- lambert branch: ReSTIR DI (RTRay.cs:277-298) ----
        # reuse only runs on the peeled first bounce: reservoir gathers are
        # the costliest XLA ops in the frame, and reuse is only live at the
        # first diffuse vertex. Divergence from the reference: pixels whose
        # first diffuse vertex sits behind a specular chain lose reuse there
        # (candidates-only RIS instead -- still unbiased).
        reuse_ok = is_lambert & (~wrote)
        en_t = (
            reuse_ok
            if (cfg.enable_temporal_reuse and allow_reuse)
            else jnp.zeros_like(reuse_ok)
        )
        en_s = (
            reuse_ok
            if (cfg.enable_spatial_reuse and allow_reuse)
            else jnp.zeros_like(reuse_ok)
        )
        static_reuse = allow_reuse and (
            cfg.enable_temporal_reuse or cfg.enable_spatial_reuse
        )
        with jax.named_scope("glue_restir"):
            state, res_out, sel = restir_mod.restir_direct(
            scene, gb_full, res_prev, state, is_lambert, pos, nrm, alb,
            pixel_idx, width, height, frame, prev_camera, cam_origin,
            sun_dir, sun_radiance, sky_top, sky_bottom, en_t, en_s,
            cfg.local_candidates, cfg.delta_candidates,
            static_reuse=static_reuse,
            reference_weighting=cfg.restir_reference_weighting,
            reps=spp, reps_pixel_major=pixel_major,
        )
        shadow_o = _offset_origin(pos, nrm, sel["wi"], cfg.eps_n)
        # pre-masked, throughput-scaled potential contribution: what lands
        # in li if the visibility ray reports unoccluded (also the RR
        # importance for _vis_rr)
        contrib_w = jnp.where(
            (is_lambert & sel["ok"])[..., None], thr * sel["contrib"], 0.0
        )
        if sun_occ0 is not None:
            # bounce 0 only: the sun's occlusion from the G-buffer point is
            # sample-invariant (same origin, same direction), so it was
            # traced ONCE per frame as a coherent batch; only non-sun
            # winners (sky candidates) still need a per-sample shadow ray.
            # imported sun winners can carry a STALE direction when the sun
            # moves between frames; only substitute when the stored wi is
            # exactly this frame's sun
            exact = jnp.all(sel["wi"] == sun_dir_n[None, :], axis=-1)
            sun_sel = sel["is_sun"] & sel["ok"] & exact
            # sun winners resolve against the shared coherent trace (never
            # RR'd -- their trace is already paid)
            li = li + jnp.where(
                (sun_sel & (~sun_occ0))[..., None], contrib_w, 0.0
            )
            q_act = sel["ok"] & (~sun_sel)
        else:
            q_act = sel["ok"]
        q_act, q_scale = _vis_rr(state, contrib_w, q_act, 0x53484457)
        if q_scale is not None:
            contrib_w = contrib_w * q_scale[..., None]
        if shadow_queue is not None:
            shadow_queue.append(
                dict(o=shadow_o, d=sel["wi"], contrib=contrib_w, act=q_act)
            )
        else:
            occluded = _shadow(
                scene, pscene, shadow_o, sel["wi"], 1e29, active=q_act,
                sort=cfg.sort_bounce_rays, morton_bounds=morton_bounds,
                treelet_bounds=treelet_bounds,
            )
            li = li + jnp.where(
                (q_act & (~occluded))[..., None], contrib_w, 0.0
            )
        # dedup/RR honesty: only lanes actually in the sorted dispatch
        # count as effective (sun-substituted lanes' coherent trace is
        # counted once at scan init; RR-killed lanes are never traced)
        eff = eff + jnp.sum(q_act.astype(jnp.float32))
        write_mask = is_lambert & (~wrote)
        res_cur = _merge_reservoirs(res_cur, res_out, write_mask)
        wrote = wrote | is_lambert

        # indirect lambert bounce + Russian roulette (RTRay.cs:300-317)
        state, dir_diffuse = sample_hemisphere_cosine(nrm, state)
        thr_lambert = thr * alb
        max_c = jnp.clip(
            jnp.max(thr_lambert, axis=-1), cfg.rr_clamp_lo, cfg.rr_clamp_hi
        )
        state, u_rr = rng_mod.next_float(state)
        rr_on = is_lambert & (depth >= cfg.rr_start_depth)
        rr_kill = rr_on & (u_rr > max_c)
        rr_scale = jnp.where(rr_on & (~rr_kill), 1.0 / max_c, 1.0)

        # ---- combine branches ----
        new_dir = jnp.where(
            is_mirror[..., None],
            dir_mirror,
            jnp.where(is_glass[..., None], dir_glass, dir_diffuse),
        )
        offn = jnp.where(is_glass[..., None], offn_glass, nrm)
        thr = jnp.where(
            is_mirror[..., None],
            thr * alb,
            jnp.where(
                is_glass[..., None],
                thr * thr_glass_mult,
                jnp.where(
                    is_lambert[..., None],
                    thr_lambert * rr_scale[..., None],
                    thr,
                ),
            ),
        )
        thr = jnp.where(rr_kill[..., None], 0.0, thr)

        trace_active = alive & (~rr_kill)
        eff = eff + jnp.sum(trace_active.astype(jnp.float32))
        ray_o = _offset_origin(pos, offn, new_dir, cfg.eps_n)
        if final and not scene.has_alpha:
            # the FINAL bounce's scatter trace is only ever consumed as a
            # sky-visibility test (hit lanes contribute nothing -- their
            # direct lighting would come from a bounce that never runs), so
            # run the cheap early-exit any-hit kernel instead of the full
            # closest walk and skip hit shading entirely. Hit/miss
            # classification is identical (same accept predicate, t_max =
            # inf). Alpha scenes keep the closest path: their shadow peel
            # applies the +-0.10 any-hit band (SceneDeviceViews.cs:297-315),
            # which is deliberately NOT the closest-hit cutout predicate.
            # potential contribution if the sky ray escapes (also the RR
            # importance); eff for these lanes was counted above as
            # trace_active -- RR-killed lanes never dispatch, so deduct.
            sky_w = jnp.where(
                trace_active[..., None],
                thr * sky_ops.sky_radiance(new_dir, sky_top, sky_bottom),
                0.0,
            )
            sky_act, sky_scale = _vis_rr(state, sky_w, trace_active,
                                         0x534B5952)
            if sky_scale is not None:
                sky_w = sky_w * sky_scale[..., None]
                eff = eff - jnp.sum(
                    (trace_active & (~sky_act)).astype(jnp.float32)
                )
            if shadow_queue is not None:
                # ride the deferred dispatch: sky radiance lands where the
                # queue trace reports NOT occluded, i.e. exactly `missed`.
                shadow_queue.append(
                    dict(o=ray_o, d=new_dir, contrib=sky_w, act=sky_act)
                )
                alive = jnp.zeros_like(trace_active)  # last bounce: unused
            else:
                occluded = _shadow(
                    scene, pscene, ray_o, new_dir, 1e29,
                    active=sky_act, sort=cfg.sort_bounce_rays,
                    morton_bounds=morton_bounds,
                    treelet_bounds=treelet_bounds,
                )
                missed = sky_act & (~occluded)
                li = li + jnp.where(missed[..., None], sky_w, 0.0)
                alive = sky_act & occluded
        else:
            hit = _trace(
                scene, pscene, ray_o, new_dir, active=trace_active,
                sort=cfg.sort_bounce_rays, morton_bounds=morton_bounds,
                treelet_bounds=treelet_bounds,
            )
            with jax.named_scope("glue_shade"):
                surf = traverse.shade_hits(scene, hit, ray_o, new_dir)
            missed = trace_active & (~hit.hit)
            li = li + jnp.where(
                missed[..., None],
                thr * sky_ops.sky_radiance(new_dir, sky_top, sky_bottom),
                0.0,
            )
            alive = trace_active & hit.hit
            keep = alive[..., None]
            pos = jnp.where(keep, surf.pos, pos)
            nrm = jnp.where(keep, surf.normal, nrm)
            alb = jnp.where(keep, surf.albedo, alb)
            shade = jnp.where(alive, surf.shading, shade)
            ior = jnp.where(alive, surf.ior, ior)
            view = jnp.where(keep, new_dir, view)

        return (
            pos, nrm, alb, shade, ior, thr, li, alive, view, state, wrote,
            res_cur, eff,
        ), None

    # noise streams stay keyed to the CANONICAL pixel id (y*width+x), not
    # the block-linear array position, so per-pixel noise is layout-invariant
    canonical_idx = py * width + px

    # bounce-0 sun occlusion is sample-invariant: one coherent trace per
    # frame from the lambert G-buffer points, shared across all spp samples
    # (the ReSTIR winner is the sun on ~half the lanes)
    sun_dir_n = vec.normalize(jnp.asarray(sun_dir, jnp.float32))
    if cfg.dedup_sun_shadow:
        wi_sun0 = jnp.broadcast_to(sun_dir_n, gb_px.pos.shape)
        lam0 = gb_px.hit & (gb_px.shading == SHADING_LAMBERT)
        sun_o0 = _offset_origin(gb_px.pos, vec.normalize(gb_px.normal),
                                wi_sun0, cfg.eps_n)
        sun_occ0 = tile(
            _shadow(scene, pscene, sun_o0, wi_sun0, 1e29, active=lam0)
        )
        # the once-per-frame coherent sun trace's live lanes count toward
        # effective rays exactly once
        eff0 = jnp.sum(lam0.astype(jnp.float32))
    else:
        sun_occ0 = None
        eff0 = jnp.float32(0.0)

    # per-lane RNG: the lane carrying (pixel i, sample s) gets the same
    # stream under either layout (sample-major lane s*m+i, pixel-major
    # lane i*spp+s)
    if pixel_major:
        sample_ids = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), m)
    else:
        sample_ids = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), m)
    state = rng_mod.seed_from_index(
        tile(canonical_idx), width, frame, sample_ids, cfg.rng_salt, noise_key
    )
    li0 = jnp.where(gb.hit[..., None], 0.0, miss_sky)
    carry = (
        gb.pos,
        vec.normalize(gb.normal),
        gb.albedo,
        gb.shading,
        gb.ior,
        jnp.ones((n, 3), jnp.float32),
        li0,
        gb.hit,
        view_i,
        state,
        jnp.zeros((n,), dtype=bool),
        jax.tree_util.tree_map(tile, res_cur_init),
        eff0,
    )
    # bounce 0 reuse-enabled, deeper bounces candidates-only; unrolled
    n_bounce = max(1, cfg.max_depth)
    for depth in range(n_bounce):
        carry, _ = bounce_step(
            carry, jnp.int32(depth), allow_reuse=(depth == 0),
            sun_occ0=sun_occ0 if depth == 0 else None,
            sun_dir_n=sun_dir_n if depth == 0 else None,
            final=(depth == n_bounce - 1),
        )
    li = carry[6]
    wrote = carry[10]
    res_vec = carry[11]
    eff = carry[12]

    if shadow_queue:
        # ONE frame-wide sorted shadow dispatch over every queued segment
        # (max_depth ReSTIR batches + the final sky-visibility batch); the
        # sort key interleaves segments by (alive, octant, morton/treelet)
        # so sun-directed rays from every bounce pack together.
        n_seg = len(shadow_queue)
        with jax.named_scope("glue_shadowqueue"):
            q_o = jnp.concatenate([q["o"] for q in shadow_queue], axis=0)
            q_d = jnp.concatenate([q["d"] for q in shadow_queue], axis=0)
            q_act = jnp.concatenate([q["act"] for q in shadow_queue], axis=0)
        occ = _shadow(
            scene, pscene, q_o, q_d, 1e29, active=q_act,
            sort=cfg.sort_bounce_rays, morton_bounds=morton_bounds,
            treelet_bounds=treelet_bounds,
        )
        with jax.named_scope("glue_shadowqueue"):
            occ_s = occ.reshape(n_seg, n)
            act_s = q_act.reshape(n_seg, n)
            for b, q in enumerate(shadow_queue):
                li = li + jnp.where(
                    (act_s[b] & (~occ_s[b]))[..., None], q["contrib"], 0.0
                )

    # fold the lanes back per pixel in sample order: radiance sums with the
    # per-sample scrub; reservoirs keep the LAST sample that wrote
    # (identical to the old sequential ping-pong merge). Per-(pixel,
    # sample) values are layout-invariant, so both branches fold the same
    # numbers in the same order.
    def sample_slice(x, s):
        if pixel_major:
            return x.reshape(m, spp, *x.shape[1:])[:, s]
        return x.reshape(spp, m, *x.shape[1:])[s]

    l_sum = jnp.zeros((m, 3), jnp.float32)
    for s in range(spp):
        l_sum = l_sum + vec.safe_color(sample_slice(li, s),
                                       cfg.safe_color_max)
    color = l_sum * (1.0 / float(spp))
    res_cur = res_cur_init
    for s in range(spp):
        res_s = jax.tree_util.tree_map(
            lambda x: sample_slice(x, s), res_vec
        )
        res_cur = _merge_reservoirs(res_cur, res_s, sample_slice(wrote, s))
    depth = vec.length(gb_px.pos - cam_origin)
    return color, depth, gb_px.obj_id, res_cur, eff


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def path_trace(
    scene: SceneData,
    gb: GBuffer,
    camera,
    prev_camera,
    res_prev: restir_mod.Reservoirs,
    res_cur_init: restir_mod.Reservoirs,
    frame,
    noise_key,
    sun_dir,
    cfg: RenderConfig,
    width: int,
    height: int,
    pscene=None,
):
    """Shade the G-buffer with spp samples of multi-bounce transport.

    Returns (color (N,3) linear, depth (N,), obj_id (N,), res_cur,
    eff_rays). `eff_rays` is the scalar count of ALIVE trace lanes actually
    dispatched (scatter lanes still alive + shadow lanes with a selected
    sample); primary-visibility rays are not included. It exists so the
    bench can report effective-ray throughput next to dispatched-lane
    throughput.
    `res_cur_init` is the buffer being overwritten this frame (pixels whose
    first diffuse vertex never materializes keep its stale contents, like the
    reference's uncleared ping-pong buffers).

    Pixel batches above cfg.chunk_pixels run as equal chunks under lax.map
    (see RenderConfig.chunk_pixels); ReSTIR reuse still gathers from the
    full-image G-buffer and previous reservoirs, so chunked and unchunked
    execution produce identical images.
    """
    n = width * height
    pixel_idx = jnp.arange(n, dtype=jnp.int32)
    target = cfg.chunk_pixels
    if target and (pscene is None or scene.has_alpha):
        # the XLA-tracer fallback and the alpha peel wrap traces in
        # lax.while_loop over spp*m lanes; while-loop graphs past ~1M lanes
        # crash the TPU fusion pass (ARCHITECTURE.md finding 6), so chunk
        # by trace LANES on those paths. The pure Pallas path has no outer
        # while loops and runs all spp*n lanes unchunked.
        target = max(1, target // max(1, cfg.spp))
    c = _pick_n_chunks(n, target)
    if c == 1:
        return _path_trace_block(
            scene, gb, gb, pixel_idx, camera, prev_camera, res_prev,
            res_cur_init, frame, noise_key, sun_dir, cfg, width, height,
            pscene,
        )
    m = n // c
    split = lambda t: jax.tree_util.tree_map(
        lambda x: x.reshape(c, m, *x.shape[1:]), t
    )
    xs = (split(gb), split(res_cur_init), pixel_idx.reshape(c, m))

    def one(x):
        gb_c, res_c, idx_c = x
        return _path_trace_block(
            scene, gb, gb_c, idx_c, camera, prev_camera, res_prev, res_c,
            frame, noise_key, sun_dir, cfg, width, height, pscene,
        )

    color, depth, obj_id, res_cur, eff = lax.map(one, xs)
    unsplit = lambda t: jax.tree_util.tree_map(
        lambda x: x.reshape(n, *x.shape[2:]), t
    )
    return (
        unsplit(color), unsplit(depth), unsplit(obj_id), unsplit(res_cur),
        jnp.sum(eff),
    )
