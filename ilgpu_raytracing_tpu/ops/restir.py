"""ReSTIR DI: weighted reservoir sampling over sky/sun candidates with
temporal reprojection and prev-frame spatial reuse.

Algorithm parity with the reference (RTRay.cs:327-543):
* per lane, 8 cosine-hemisphere "local" candidates scored against the sky +
  1 directional-sun delta candidate, mixture pdfs 8/9 and 1/9 (:443-472);
* streaming reservoir update (:393-405);
* temporal reuse: reproject the shaded point through the previous camera to a
  prev-frame pixel and import that reservoir (:338-360, 475-483);
* spatial reuse: 8-neighborhood of PREV-frame reservoirs with hashed
  rotation / radius 1-2 (:485-516);
* imported reservoirs are re-scored at the receiver with the
  contribution weight W = wSum / (m * w) (:407-435);
* one visibility ray for the selected sample only (:518-539).

Deliberate divergence: the reference's exact reuse weighting is measurably
BIASED (its W is computed from the stored *score*, which makes the final
f/pdfSel * W cancel to f/(m*pdfSel) per candidate -- correct for fresh
cos-distributed candidates, wrong for imports whose sample is
RIS-distributed; +52% mean direct light on the default scene). By default
this module stores the target value s_hat(y) in the reservoir `w` slot and
shades with f * wSum / (m * s_hat), the textbook unbiased RIS/UCW estimator;
it is numerically identical to the reference on the candidates-only path.
`RenderConfig.restir_reference_weighting=True` reproduces the reference's
formula exactly (kept for behavioral A/B parity).

Neighbor compatibility uses the CURRENT frame's G-buffer on both sides, like
the reference (:362-374) -- including for the temporally reprojected pixel (a
reference quirk kept for parity).

TPU shape: everything is a masked lane-parallel op over flat (N,) batches;
candidate loops are static unrolls; all reservoir reads are gathers; the
single visibility test is one batched shadow_occlusion call issued by the
integrator (so traversal stays out of this module).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ilgpu_raytracing_tpu.ops import layout
from ilgpu_raytracing_tpu.ops import sky as sky_ops
from ilgpu_raytracing_tpu.ops.sampling import (
    INV_PI,
    cos_hemisphere_pdf,
    sample_hemisphere_cosine,
)
from ilgpu_raytracing_tpu.utils import rng as rng_mod
from ilgpu_raytracing_tpu.utils import vec

LIGHT_ENV = 1
LIGHT_SUN = 2
EPS_MIN = 1e-6


@struct.dataclass
class Reservoirs:
    """SoA reservoir state, one slot per pixel (RTRay.cs:171-179)."""

    L: jnp.ndarray  # (N,3) candidate radiance
    wi: jnp.ndarray  # (N,3) candidate direction
    pdf: jnp.ndarray  # (N,) selection pdf (mixture)
    w: jnp.ndarray  # (N,) winner's target value s_hat(y) (score in ref mode)
    w_sum: jnp.ndarray  # (N,) sum of scores
    m: jnp.ndarray  # (N,) i32 candidates seen
    light_id: jnp.ndarray  # (N,) i32
    W: jnp.ndarray  # (N,) final unbiased contribution weight wSum/(Z*s_hat)

    @staticmethod
    def empty(n: int) -> "Reservoirs":
        return Reservoirs(
            L=jnp.zeros((n, 3), jnp.float32),
            wi=jnp.zeros((n, 3), jnp.float32),
            pdf=jnp.zeros((n,), jnp.float32),
            w=jnp.zeros((n,), jnp.float32),
            w_sum=jnp.zeros((n,), jnp.float32),
            m=jnp.zeros((n,), jnp.int32),
            light_id=jnp.zeros((n,), jnp.int32),
            W=jnp.zeros((n,), jnp.float32),
        )

    def gather(self, idx: jnp.ndarray) -> "Reservoirs":
        take = lambda a: jnp.take(a, jnp.maximum(idx, 0), axis=0, mode="clip")
        return Reservoirs(
            L=take(self.L),
            wi=take(self.wi),
            pdf=take(self.pdf),
            w=take(self.w),
            w_sum=take(self.w_sum),
            m=take(self.m),
            light_id=take(self.light_id),
            W=take(self.W),
        )


def reservoir_update(res: Reservoirs, state, wi, pdf_sel, li, score, s_hat,
                     light_id, mask):
    """Masked streaming update (RTRay.cs:393-405). Returns (state, res).

    `score` drives selection and accumulates into w_sum; `s_hat` is what the
    `w` slot records for the winner. The reference stores the score itself
    (s_hat == score); the default unbiased weighting stores the target value
    s_hat(y) so the UCW wSum/(m*w) is the true 1/s_hat(y) * wSum/m."""
    add = jnp.where(mask, score, 0.0)
    new_sum = res.w_sum + add
    accept_p = jnp.where(new_sum > 0.0, add / jnp.maximum(new_sum, EPS_MIN), 0.0)
    state, u = rng_mod.next_float(state)
    take = mask & (u < accept_p)
    lid = jnp.broadcast_to(jnp.asarray(light_id, jnp.int32), res.m.shape)
    return state, Reservoirs(
        L=jnp.where(take[..., None], li, res.L),
        wi=jnp.where(take[..., None], wi, res.wi),
        pdf=jnp.where(take, pdf_sel, res.pdf),
        w=jnp.where(take, s_hat, res.w),
        w_sum=jnp.where(mask, new_sum, res.w_sum),
        m=res.m + jnp.where(mask, 1, 0).astype(jnp.int32),
        light_id=jnp.where(take, lid, res.light_id),
        W=res.W,
    )


def reproject_to_prev_pixel(pos, prev_cam, width: int, height: int):
    """World point -> prev-frame array position or -1 (RTRay.cs:338-360).

    Positions are in the frame's block-linear layout (ops/layout.py) --
    reservoir state is stored in that order every frame."""
    origin = jnp.asarray(prev_cam.origin, jnp.float32)
    right = jnp.asarray(prev_cam.right, jnp.float32)
    up = jnp.asarray(prev_cam.up, jnp.float32)
    forward = jnp.asarray(prev_cam.forward, jnp.float32)
    fov_y = jnp.asarray(prev_cam.fov_y, jnp.float32)
    aspect = jnp.asarray(prev_cam.aspect, jnp.float32)

    p = pos - origin
    x = vec.dot(p, right)
    y = vec.dot(p, up)
    z = vec.dot(p, forward)
    ok = z > 1e-4
    z_safe = jnp.where(ok, z, 1.0)
    tan_half = jnp.tan(0.5 * fov_y)
    ndc_x = x / (z_safe * tan_half * aspect)
    ndc_y = y / (z_safe * tan_half)
    fx = 0.5 * (ndc_x + 1.0) * width
    fy = 0.5 * (ndc_y + 1.0) * height
    px = jnp.floor(fx).astype(jnp.int32)
    py = jnp.floor(fy).astype(jnp.int32)
    inside = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    idx = layout.position_from_xy(px, py, width, height)
    return jnp.where(ok & inside, idx, -1)


def _pack_reservoirs(res_prev: Reservoirs):
    """(N,12) row layout so each import costs ONE gather instead of seven
    (gathers dominate the reuse cost on TPU). m/light_id ride as exact
    small floats."""
    return jnp.concatenate(
        [
            res_prev.L,
            res_prev.wi,
            res_prev.pdf[:, None],
            res_prev.w[:, None],
            res_prev.w_sum[:, None],
            res_prev.m.astype(jnp.float32)[:, None],
            res_prev.light_id.astype(jnp.float32)[:, None],
            res_prev.W[:, None],
        ],
        axis=1,
    )


def _pack_gbuffer(gb):
    """(N,7) rows: pos(3) normal(3) obj_id (exact small float, like m)."""
    obj_f = gb.obj_id.astype(jnp.float32)
    return jnp.concatenate([gb.pos, gb.normal, obj_f[:, None]], axis=1)


def _import_from_prev(res, state, res_packed, gb_packed, own_obj, own_z,
                      prev_idx, mask, cam_origin, n, albedo,
                      mix_local, mix_delta, sun_radiance, sky_top, sky_bottom,
                      reference_weighting: bool):
    """Import + re-score a prev-frame reservoir (RTRay.cs:407-435) fetched
    by array position (temporal reprojection): one fused row-gather carrying
    the packed prev reservoir and the packed neighbor G-buffer row."""
    n_res = res_packed.shape[0]
    valid = mask & (prev_idx >= 0) & (prev_idx < n_res)
    safe = jnp.maximum(prev_idx, 0)
    # ONE fused (N,19) row gather: TPU gather cost is dominated by a
    # per-gather fixed term, near-flat in row width (round-4 microbench at
    # 1.8M rows: (N,2) and (N,6) row gathers cost within ~2x of each other
    # while a second gather doubles the cost), so the reservoir and
    # G-buffer rows ride the same gather.
    both = jnp.take(
        jnp.concatenate([res_packed, gb_packed], axis=1), safe, axis=0,
        mode="clip",
    )
    row, gbr = both[:, :12], both[:, 12:]
    return _import_rows(
        res, state, row, gbr, valid, own_obj, own_z, cam_origin, n, albedo,
        mix_local, mix_delta, sun_radiance, sky_top, sky_bottom,
        reference_weighting,
    )


def _import_rows(res, state, row, gbr, valid, own_obj, own_z, cam_origin, n,
                 albedo, mix_local, mix_delta, sun_radiance, sky_top,
                 sky_bottom, reference_weighting: bool):
    """Re-score + merge pre-fetched packed rows (reservoir compatibility
    test RTRay.cs:362-374 with the own-pixel side precomputed)."""
    obj_b = gbr[:, 6].astype(jnp.int32)
    n_b = vec.normalize(gbr[:, 3:6])
    z_b = vec.length(gbr[:, 0:3] - cam_origin)
    ndot = vec.dot(n, n_b)
    rel = jnp.abs(own_z - z_b) / jnp.maximum(1e-3, own_z)
    compatible = (own_obj == obj_b) | ((ndot >= 0.85) & (rel < 0.05))
    valid = valid & compatible

    pr = Reservoirs(
        L=row[:, 0:3],
        wi=row[:, 3:6],
        pdf=row[:, 6],
        w=row[:, 7],
        w_sum=row[:, 8],
        m=row[:, 9].astype(jnp.int32),
        light_id=row[:, 10].astype(jnp.int32),
        W=row[:, 11],
    )
    valid = valid & (pr.m > 0) & (pr.w > 0.0) & (pr.w_sum > 0.0)
    if not reference_weighting:
        valid = valid & (pr.W > 0.0)

    wi = pr.wi
    is_sun = pr.light_id == LIGHT_SUN
    li = jnp.where(
        is_sun[..., None],
        jnp.asarray(sun_radiance, jnp.float32),
        sky_ops.sky_radiance(wi, sky_top, sky_bottom),
    )
    nl = jnp.maximum(0.0, vec.dot(n, wi))
    pdf_here = jnp.where(
        is_sun,
        jnp.maximum(EPS_MIN, mix_delta),
        jnp.maximum(EPS_MIN, cos_hemisphere_pdf(n, wi) * mix_local),
    )
    if reference_weighting:
        # Reference formula (RTRay.cs:418-434): Wsrc recomputed from the
        # stored score, import score = lum(f/pdfHere)*Wsrc, stored w = that
        # score. Biased -- see RenderConfig docstring.
        w_src = pr.w_sum / (
            jnp.maximum(1, pr.m).astype(jnp.float32)
            * jnp.maximum(EPS_MIN, pr.w)
        )
        s_here = vec.luminance(albedo * li * ((nl / pdf_here) * INV_PI)[..., None])
        eff = s_here * w_src
        s_hat = eff
    else:
        # Unbiased merge: candidate weight s_hat_here(y) * Wsrc with Wsrc the
        # source's stored Z-corrected UCW; stored w = s_hat_here(y).
        s_hat = vec.luminance(albedo * li * (nl * INV_PI)[..., None])
        eff = s_hat * pr.W
    lid = jnp.where(is_sun, LIGHT_SUN, LIGHT_ENV)
    state, res = reservoir_update(
        res, state, wi, pdf_here, li, eff, s_hat, lid, valid
    )
    return state, res, n_b, valid


# 8-neighborhood base patterns (RTRay.cs:376-391); per pixel the pattern is
# rotated by a hashed rot in {0..3} and scaled by radius in {1,2}
_NEIGHBOR_BASE = ((-1, 0), (1, 0), (0, -1), (0, 1),
                  (-1, -1), (1, -1), (-1, 1), (1, 1))


def _rotate_offset(cx: int, cy: int, ro: int):
    if ro == 0:
        return cx, cy
    if ro == 1:
        return -cy, cx
    if ro == 2:
        return -cx, -cy
    return cy, -cx


def _spatial_row_fetcher(res_packed, gb_packed, width: int, height: int,
                         frame):
    """Gather-free spatial neighbor row fetch.

    The 8 spatial imports read rows at per-pixel offsets of at most +-2
    pixels. Row gathers for that cost ~12 ms each at 1080p on v5e (~210
    ms/frame over 9 imports x spp); but every (slot, rot, radius) variant is
    a STATIC 2D shift, so this precomputes the packed rows as an image
    (layout.to_image -- a pure transpose), pads once, and per slot selects
    among the 8 shifted variants by each pixel's hashed rot/radius. No
    gathers; the whole fetch fuses into bandwidth-bound selects.

    Returns fetch(slot, start, count) -> (rows12, rows7) for the chunk of
    array positions [start, start+count)."""
    import jax

    arr = jnp.concatenate([res_packed, gb_packed], axis=1)  # (N,19)
    img = layout.to_image(arr, width, height)
    pad = jnp.pad(img, ((2, 2), (2, 2), (0, 0)))
    xs = jnp.arange(width, dtype=jnp.int32)[None, :]
    ys = jnp.arange(height, dtype=jnp.int32)[:, None]
    h = rng_mod.hash32(
        rng_mod.u32(ys * width + xs)
        ^ rng_mod.hash32(
            rng_mod.u32(frame) ^ rng_mod.hash32(rng_mod.u32(0xB31F5AB1))
        )
    )
    rot = (h & rng_mod.u32(3)).astype(jnp.int32)
    rad = 1 + ((h >> rng_mod.u32(2)) & rng_mod.u32(1)).astype(jnp.int32)

    def fetch(slot: int, start, count: int):
        cx, cy = _NEIGHBOR_BASE[slot]
        sel = jnp.zeros((height, width, arr.shape[1]), jnp.float32)
        for ro in range(4):
            rcx, rcy = _rotate_offset(cx, cy, ro)
            for ra in (1, 2):
                dx, dy = rcx * ra, rcy * ra
                shifted = jax.lax.slice(
                    pad, (2 + dy, 2 + dx, 0),
                    (2 + dy + height, 2 + dx + width, arr.shape[1]),
                )
                inb = (
                    (xs + dx >= 0) & (xs + dx < width)
                    & (ys + dy >= 0) & (ys + dy < height)
                )
                m = (rot == ro) & (rad == ra) & inb
                sel = jnp.where(m[..., None], shifted, sel)
        flat = layout.from_image(sel)
        chunk = jax.lax.dynamic_slice(
            flat, (start, jnp.int32(0)), (count, arr.shape[1])
        )
        return chunk[:, :12], chunk[:, 12:]

    return fetch


def restir_direct(
    scene_unused,
    gb,
    res_prev: Reservoirs,
    state,
    active,
    pos,
    n,
    albedo,
    pixel_idx,
    width: int,
    height: int,
    frame,
    prev_cam,
    cam_origin,
    sun_dir,
    sun_radiance,
    sky_top,
    sky_bottom,
    enable_temporal,
    enable_spatial,
    local_candidates: int = 8,
    delta_candidates: int = 1,
    static_reuse: bool = True,
    reference_weighting: bool = False,
    reps: int = 1,
    reps_pixel_major: bool = False,
):
    """Candidate generation + reuse + selection (RTRay.cs:437-516).

    Returns (state, res, sel) where `sel` carries the selected sample's
    shading quantities; the caller performs the single visibility ray and
    applies `sel.contrib` where visible (final step RTRay.cs:518-539 is split
    out so the integrator can batch the shadow rays).

    static_reuse=False omits the temporal/spatial import code entirely
    (candidates-only RIS): reservoir gathers are the single most expensive
    XLA op in the frame (~60% of frame time at 1080p measured on v5e), and
    deeper vertices never reuse anyway (RTRay.cs:282-287).

    reps>1 declares that the batch is `reps` spp-sample views of the SAME
    pixel range (pixel_idx expanded to match): the spatial neighbor rows
    -- which depend only on the pixel, not the sample -- are then fetched
    once per pixel and expanded, instead of re-selected per sample (the
    per-sample RNG still drives independent streaming updates per lane).
    reps_pixel_major selects the expansion: False = stacked sample tiles
    ([tile0; tile1; ...], jnp.tile), True = a pixel's samples adjacent
    (jnp.repeat) -- must match the integrator's lane layout
    (config.spp_pixel_major).
    """
    total = local_candidates + delta_candidates
    mix_local = float(local_candidates) / float(total)
    mix_delta = float(delta_candidates) / float(total)

    res = Reservoirs.empty(pos.shape[0])

    # (1) local BRDF/env candidates
    for _ in range(local_candidates):
        state, wi = sample_hemisphere_cosine(n, state)
        nl = jnp.maximum(0.0, vec.dot(n, wi))
        pdf_local = jnp.maximum(EPS_MIN, cos_hemisphere_pdf(n, wi))
        pdf_sel = jnp.maximum(EPS_MIN, pdf_local * mix_local)
        li = sky_ops.sky_radiance(wi, sky_top, sky_bottom)
        s_hat = vec.luminance(albedo * li * (nl * INV_PI)[..., None])
        s = s_hat / pdf_sel
        state, res = reservoir_update(
            res, state, wi, pdf_sel, li, s,
            s if reference_weighting else s_hat, LIGHT_ENV, active
        )

    # (2) directional sun delta candidate
    wi_sun = jnp.broadcast_to(
        vec.normalize(jnp.asarray(sun_dir, jnp.float32)), pos.shape
    )
    nl = jnp.maximum(0.0, vec.dot(n, wi_sun))
    pdf_sel = jnp.full_like(nl, max(EPS_MIN, mix_delta))
    li_sun = jnp.broadcast_to(jnp.asarray(sun_radiance, jnp.float32), pos.shape)
    s_hat = vec.luminance(albedo * li_sun * (nl * INV_PI)[..., None])
    s = s_hat / pdf_sel
    state, res = reservoir_update(
        res, state, wi_sun, pdf_sel, li_sun, s,
        s if reference_weighting else s_hat, LIGHT_SUN, active
    )

    imports = []  # (src_normal, accepted-into-stream mask) per import
    if static_reuse:
        res_packed = _pack_reservoirs(res_prev)
        gb_packed = _pack_gbuffer(gb)
        # own-pixel fetch: pixel_idx is always `reps` tiled copies of a
        # contiguous pixel range (the integrator chunks by slicing), so the
        # own rows come from ONE dynamic slice + tile instead of two (N,)
        # gathers (~12 ms each at 1.8M lanes on v5e).
        start = pixel_idx[0]
        m_px = pos.shape[0] // max(1, reps)
        own_sl = jax.lax.dynamic_slice(
            jnp.concatenate(
                [gb.pos, gb.obj_id.astype(jnp.float32)[:, None]], axis=1
            ),
            (start, jnp.int32(0)), (m_px, 4),
        )
        if reps > 1:
            own_sl = (jnp.repeat(own_sl, reps, axis=0)
                      if reps_pixel_major else jnp.tile(own_sl, (reps, 1)))
        own_obj = own_sl[:, 3].astype(jnp.int32)
        own_z = vec.length(own_sl[:, 0:3] - cam_origin)

        # (3) temporal reuse via camera reprojection
        prev_idx = reproject_to_prev_pixel(pos, prev_cam, width, height)
        state, res, n_b, vld = _import_from_prev(
            res, state, res_packed, gb_packed, own_obj, own_z, prev_idx,
            active & enable_temporal, cam_origin, n, albedo, mix_local,
            mix_delta, sun_radiance, sky_top, sky_bottom, reference_weighting,
        )
        imports.append((n_b, vld))

        # (4) spatial reuse: 8 prev-frame neighbors, hashed rotation/radius
        # (hash keyed on the canonical pixel id, so noise is
        # layout-invariant). Neighbor rows arrive through the gather-free
        # shifted-variant fetch; out-of-bounds or unselected rows carry
        # m == 0 and fail the import validity gate, matching the old
        # per-lane `inside` mask.
        fetch = _spatial_row_fetcher(
            res_packed, gb_packed, width, height, frame
        )
        for slot in range(len(_NEIGHBOR_BASE)):
            row12, gbr7 = fetch(slot, start, m_px)
            if reps > 1:
                if reps_pixel_major:
                    row12 = jnp.repeat(row12, reps, axis=0)
                    gbr7 = jnp.repeat(gbr7, reps, axis=0)
                else:
                    row12 = jnp.tile(row12, (reps, 1))
                    gbr7 = jnp.tile(gbr7, (reps, 1))
            state, res, n_b, vld = _import_rows(
                res, state, row12, gbr7, active & enable_spatial, own_obj,
                own_z, cam_origin, n, albedo, mix_local, mix_delta,
                sun_radiance, sky_top, sky_bottom, reference_weighting,
            )
            imports.append((n_b, vld))

    # (5) selection shading (visibility applied by the caller)
    ok = active & (res.m > 0) & (res.w_sum > 0.0) & (res.w > 0.0)
    wi_sel = res.wi
    is_sun = res.light_id == LIGHT_SUN
    nl_sel = jnp.maximum(0.0, vec.dot(n, wi_sel))
    ok = ok & (nl_sel > 0.0)
    li_sel = jnp.where(
        is_sun[..., None],
        jnp.asarray(sun_radiance, jnp.float32),
        sky_ops.sky_radiance(wi_sel, sky_top, sky_bottom),
    )
    if reference_weighting:
        z_count = jnp.maximum(1, res.m).astype(jnp.float32)
    else:
        # Z-counting (the unbiased-ReSTIR correction): discount accepted
        # imports whose source target distribution could not have produced the
        # winner (winner direction below the source's horizon). Without this,
        # reuse across curved geometry darkens by ~1% (support mismatch);
        # measured exactly mean-preserving with it (tools/restir_bias.py).
        z_sub = jnp.zeros_like(res.w_sum)
        for n_src, vld in imports:
            uncovered = vld & (vec.dot(n_src, wi_sel) <= 0.0)
            z_sub = z_sub + uncovered.astype(jnp.float32)
        z_count = jnp.maximum(1.0, res.m.astype(jnp.float32) - z_sub)
    w_ucw = res.w_sum / z_count / jnp.maximum(EPS_MIN, res.w)
    res = res.replace(W=jnp.where(ok, w_ucw, 0.0))
    if reference_weighting:
        # Reference final shading (RTRay.cs:521-539): f/pdfSel * wSum/(m*w),
        # with pdfSel recomputed at selection time.
        pdf_sel = jnp.where(
            is_sun,
            jnp.maximum(EPS_MIN, mix_delta),
            jnp.maximum(EPS_MIN, cos_hemisphere_pdf(n, wi_sel) * mix_local),
        )
        f_sel = albedo * li_sel * ((nl_sel / pdf_sel) * INV_PI)[..., None]
    else:
        # Unbiased: contrib = f(y) * wSum / (Z * s_hat(y)); res.w == s_hat(y)
        # so the pdf never enters. Identical to the reference formula whenever
        # the winner is a fresh candidate (s_hat = score * pdfSel).
        f_sel = albedo * li_sel * (nl_sel * INV_PI)[..., None]
    contrib = f_sel * w_ucw[..., None]
    return state, res, dict(ok=ok, wi=wi_sel, contrib=contrib, is_sun=is_sun)
