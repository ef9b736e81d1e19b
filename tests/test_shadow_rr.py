"""Visibility-ray Russian roulette (config.shadow_rr_lum).

The knob skips low-contribution shadow rays with probability 1-p and
scales survivors by 1/p (integrator._vis_rr) -- an unbiased estimator
change layered on the reference's always-trace behavior
(RTRay.cs:518-539). The RR draw is a side-stream of the lane's current
rng state (utils/rng.side_float), so the main per-lane streams are
bit-identical whether the knob is on or off.
"""

import numpy as np
import pytest

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.cornell import (
    build_cornell_scene,
    cornell_camera,
)
from ilgpu_raytracing_tpu.ops import integrator, restir, sky

W, H = 48, 32


@pytest.fixture(scope="module")
def cornell():
    _, scene = build_cornell_scene(tess=8, sphere_tess=(12, 16))
    cam = cornell_camera(W, H)
    gb = integrator.primary_visibility(scene, cam, W, H)
    return scene, cam, gb


def _frame(scene, cam, gb, cfg, key=1234, frame=0):
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    ra = restir.Reservoirs.empty(W * H)
    rb = restir.Reservoirs.empty(W * H)
    color, _, _, _, eff = integrator.path_trace(
        scene, gb, cam, cam, ra, rb, frame, np.uint32(key), sun, cfg, W, H
    )
    return np.asarray(color), float(np.asarray(eff))


# baseline pins the knob OFF (the production default is 0.3; see
# config.py for the measured divergence)
BASE = dict(spp=2, max_depth=3, sun_azimuth=0.3, sun_elevation=0.6,
            shadow_rr_lum=0.0)


def test_tiny_threshold_is_bit_identical(cornell):
    """p clamps to 1 for every lane when the threshold underflows any
    real contribution => no lane killed, scale exactly 1, and (because
    the draw never advances the main stream) the image is BIT-identical
    to the knob being off."""
    scene, cam, gb = cornell
    off, eff_off = _frame(scene, cam, gb, RenderConfig(**BASE))
    on, eff_on = _frame(
        scene, cam, gb, RenderConfig(**{**BASE, "shadow_rr_lum": 1e-30})
    )
    assert np.array_equal(off, on)
    assert eff_off == eff_on


@pytest.mark.slow
def test_rr_kills_lanes_and_stays_unbiased(cornell):
    """At a working threshold some visibility lanes are skipped (eff
    drops) while the estimator mean is preserved within the Monte-Carlo
    tolerance of a seed ensemble."""
    scene, cam, gb = cornell
    cfg_off = RenderConfig(**BASE)
    cfg_on = RenderConfig(**{**BASE, "shadow_rr_lum": 0.3})
    means = {"off": [], "on": []}
    eff_off = eff_on = 0.0
    for s in range(12):
        key = (s * 2654435761 + 1) & 0xFFFFFFFF
        a, e0 = _frame(scene, cam, gb, cfg_off, key=key)
        b, e1 = _frame(scene, cam, gb, cfg_on, key=key)
        means["off"].append(a.mean())
        means["on"].append(b.mean())
        eff_off += e0
        eff_on += e1
    assert eff_on < 0.95 * eff_off  # lanes actually died
    m0 = np.mean(means["off"])
    m1 = np.mean(means["on"])
    # per-seed scene-mean sem is ~0.1%; allow 1% for 12 seeds
    assert abs(m1 - m0) / m0 < 0.01


def test_killed_lanes_never_brighten_unlit(cornell):
    """A skipped visibility ray counts as occluded: it can only remove
    light that the full trace would also have removed or kept -- the RR
    image's per-pixel values stay finite and non-negative."""
    scene, cam, gb = cornell
    img, _ = _frame(
        scene, cam, gb,
        RenderConfig(**{**BASE, "shadow_rr_lum": 1.0,
                        "shadow_rr_pmin": 0.05}),
    )
    assert np.isfinite(img).all()
    assert (img >= 0.0).all()
