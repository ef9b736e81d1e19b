"""Statistical unbiasedness test for ReSTIR temporal+spatial reuse.

SURVEY.md section 7 hard-part (c): the UCW re-scoring path
(RTRay.cs:407-435, 518-539; ops/restir.py _import_from_prev) must preserve
the estimator mean — reuse may only reduce variance. A biased importer
(wrong mixture pdf, missing 1/M, wrong UCW) shifts the mean and slips past
every golden/image test, so this test compares the Monte-Carlo mean of the
reuse estimator against the candidates-only estimator over many independent
noise streams.

Setup: default sphere scene, static camera, max_depth=1 (isolates direct
lighting; the single indirect miss term is identical in both estimators).
For each of S independent seeds we render a short frame sequence with
temporal+spatial reuse (reservoirs warmed over F frames, exactly the
production ping-pong), and one candidates-only frame. The pixel-averaged
difference of means must vanish within CLT bounds, and per-pixel z-scores
must not show systematic shift.
"""

from __future__ import annotations

import numpy as np

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.camera import Camera
from ilgpu_raytracing_tpu.models.scene import build_default_scene
from ilgpu_raytracing_tpu.ops import integrator, restir, sky
import pytest

pytestmark = pytest.mark.slow  # statistical: 48-seed frame sequences

W, H = 48, 32
SEEDS = 48
WARM_FRAMES = 3


def _frame_sequence(scene, gb, cam, cfg, noise_key, frames):
    """Render `frames` frames with production reservoir ping-pong; return
    the last frame's color (reuse fully warmed)."""
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


def test_reuse_preserves_direct_lighting_mean():
    _, scene = build_default_scene()
    cam = Camera.create(W, H, 60.0)
    cfg_reuse = RenderConfig(
        spp=2, max_depth=1, enable_temporal_reuse=True,
        enable_spatial_reuse=True,
    )
    cfg_base = RenderConfig(
        spp=2, max_depth=1, enable_temporal_reuse=False,
        enable_spatial_reuse=False,
    )
    gb = integrator.primary_visibility(scene, cam, W, H)

    reuse = np.zeros((SEEDS, W * H, 3), np.float32)
    base = np.zeros((SEEDS, W * H, 3), np.float32)
    for s in range(SEEDS):
        key = (s * 2654435761 + 1) & 0xFFFFFFFF
        reuse[s] = _frame_sequence(scene, gb, cam, cfg_reuse, key, WARM_FRAMES)
        base[s] = _frame_sequence(scene, gb, cam, cfg_base, key ^ 0xA5A5A5A5, 1)

    lum = np.array([0.2126, 0.7152, 0.0722], np.float32)
    reuse_l = reuse @ lum
    base_l = base @ lum

    mean_r = reuse_l.mean(axis=0)
    mean_b = base_l.mean(axis=0)
    var_r = reuse_l.var(axis=0, ddof=1)
    var_b = base_l.var(axis=0, ddof=1)

    # only pixels where direct lighting varies (lambert hits); miss/specular
    # pixels are deterministic here and would divide by ~zero below
    se = np.sqrt((var_r + var_b) / SEEDS)
    lit = se > 1e-6
    assert lit.sum() > 200  # sanity: the scene has plenty of lambert pixels

    z = (mean_r[lit] - mean_b[lit]) / se[lit]
    # (a) no systematic shift: the mean z-score over pixels is ~N(0, 1/sqrt(P))
    p = z.size
    assert abs(z.mean()) < 5.0 / np.sqrt(p), (
        f"systematic bias: mean z = {z.mean():.4f} over {p} pixels"
    )
    # (b) no gross per-pixel bias: z is approx standard normal; allow heavy
    # tails but catch real estimator breaks
    assert np.abs(z).mean() < 2.0, f"|z| mean {np.abs(z).mean():.3f}"
    assert (np.abs(z) > 6.0).mean() < 0.01

    # (c) variance must stay bounded. On this 2-light scene (delta sun +
    # smooth sky) candidates-only RIS is already near-optimal, so reuse adds
    # mild UCW-chain noise (~10-20% measured) rather than helping; the guard
    # here is against catastrophic heavy-tail blowup, not for a win.
    assert var_r[lit].mean() < var_b[lit].mean() * 1.5


def test_reuse_engages_reservoirs():
    """Reuse must actually import: after a warm frame, lambert pixels'
    reservoirs count temporal+spatial candidates beyond the 9 fresh ones."""
    from ilgpu_raytracing_tpu.ops import sky

    _, scene = build_default_scene()
    cam = Camera.create(W, H, 60.0)
    cfg = RenderConfig(spp=1, max_depth=1, enable_temporal_reuse=True,
                       enable_spatial_reuse=True)
    gb = integrator.primary_visibility(scene, cam, W, H)
    n = W * H
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    ra = restir.Reservoirs.empty(n)
    rb = restir.Reservoirs.empty(n)
    _, _, _, rc, _ = integrator.path_trace(
        scene, gb, cam, cam, ra, rb, 0, np.uint32(7), sun, cfg, W, H)
    _, _, _, rc2, _ = integrator.path_trace(
        scene, gb, cam, cam, rc, ra, 1, np.uint32(7), sun, cfg, W, H)
    m = np.asarray(rc2.m)
    lam = m > 0  # lambert pixels ran restir
    assert lam.sum() > 200
    # fresh candidates = 9; imports must add several more on most pixels
    assert (m[lam] > 9).mean() > 0.8
    assert m[lam].mean() > 12.0
    # stored unbiased contribution weights are populated and finite
    Wf = np.asarray(rc2.W)[lam]
    assert np.isfinite(Wf).all() and (Wf > 0).mean() > 0.9
