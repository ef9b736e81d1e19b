"""spp lane layout (config.spp_pixel_major) is a pure lane permutation:
per-(pixel, sample) RNG streams, trace results, ReSTIR rows, and fold
order are layout-invariant, so images must be BIT-identical."""

import dataclasses

import jax
import numpy as np
import pytest

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene, cornell_camera
from ilgpu_raytracing_tpu.ops import integrator, restir, sky


def _run(cfg, scene, pscene, w, h):
    cam = cornell_camera(w, h)
    gb = integrator.primary_visibility(scene, cam, w, h, 0, pscene)
    res0 = restir.Reservoirs.empty(w * h)
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    color, depth, obj, res_cur, eff = integrator.path_trace(
        scene, gb, cam, cam, res0, res0, np.uint32(0), np.uint32(0), sun,
        cfg, w, h, pscene,
    )
    return (
        np.asarray(color), np.asarray(eff),
        jax.tree_util.tree_map(np.asarray, res_cur),
    )


def _assert_layout_invariant(base, scene, pscene, w, h):
    out = {}
    for pm in (False, True):
        cfg = dataclasses.replace(base, spp_pixel_major=pm)
        out[pm] = _run(cfg, scene, pscene, w, h)
    np.testing.assert_array_equal(out[True][0], out[False][0])
    np.testing.assert_array_equal(out[True][1], out[False][1])
    for k in ("w_sum", "m", "wi", "light_id"):
        np.testing.assert_array_equal(
            getattr(out[True][2], k), getattr(out[False][2], k), err_msg=k
        )


def test_pixel_major_bit_identical_xla():
    w, h = 24, 16
    _, scene = build_cornell_scene(tess=2, sphere_tess=(6, 8),
                                   blas_leaf_size=8)
    base = RenderConfig(spp=2, max_depth=1, rng_lock_noise=0)
    _assert_layout_invariant(base, scene, None, w, h)


@pytest.mark.slow
def test_pixel_major_bit_identical_wide_kernel():
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk

    w, h = 32, 32
    _, scene = build_cornell_scene(tess=4, sphere_tess=(8, 12),
                                   blas_leaf_size=8)
    pscene = wk.prepare_wide(tk.prepare(scene))
    base = RenderConfig(spp=2, max_depth=2, rng_lock_noise=0)
    _assert_layout_invariant(base, scene, pscene, w, h)
    # and combined with the deferred shadow queue
    base_d = dataclasses.replace(base, deferred_shadows=True)
    _assert_layout_invariant(base_d, scene, pscene, w, h)
