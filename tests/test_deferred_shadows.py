"""Deferred frame-wide shadow queue (config.deferred_shadows) equivalence.

Visibility rays only scale radiance contributions (RTRay.cs:518-539); the
deferred queue traces the SAME rays in one dispatch, so images must match
the inline path up to fp summation order.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene, cornell_camera
from ilgpu_raytracing_tpu.ops import integrator
from ilgpu_raytracing_tpu.ops import sky
from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
from ilgpu_raytracing_tpu.ops import restir as restir_mod


def _run(cfg, scene, pscene, w, h):
    cam = cornell_camera(w, h)
    gb = integrator.primary_visibility(scene, cam, w, h, 0, pscene)
    res0 = restir_mod.Reservoirs.empty(w * h)
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    color, depth, obj, res_cur, eff = integrator.path_trace(
        scene, gb, cam, cam, res0, res0, np.uint32(0), np.uint32(0), sun,
        cfg, w, h, pscene,
    )
    return (
        np.asarray(color), np.asarray(eff),
        jax.tree_util.tree_map(np.asarray, res_cur),
    )


@pytest.mark.slow
def test_deferred_matches_inline_wide_kernel():
    # slow: two interpret-mode wide-kernel path_trace modules cold-compile
    # in minutes on the 1-core host (cached after); the TPU-side
    # equivalence check is tools/shadowqueue_ab.py --check
    w, h = 32, 32
    _, scene = build_cornell_scene(tess=4, sphere_tess=(8, 12),
                                   blas_leaf_size=8)
    pscene = wk.prepare_wide(tk.prepare(scene))
    base = RenderConfig(spp=2, max_depth=2, rng_lock_noise=0)

    out = {}
    for defer in (False, True):
        cfg = dataclasses.replace(base, deferred_shadows=defer)
        out[defer] = _run(cfg, scene, pscene, w, h)

    color_i, eff_i, res_i = out[False]
    color_d, eff_d, res_d = out[True]
    # same rays, same kernels; only the order radiance terms sum in differs
    np.testing.assert_allclose(color_d, color_i, rtol=3e-5, atol=3e-6)
    # effective-ray accounting must be identical (deferred lanes counted
    # once at queue time, sun-dedup substitutions excluded on both paths)
    np.testing.assert_array_equal(eff_d, eff_i)
    # reservoir writes never depend on visibility -- bit-identical
    for k in ("w_sum", "m", "pdf", "light_id"):
        np.testing.assert_array_equal(
            getattr(res_d, k), getattr(res_i, k), err_msg=k
        )


@pytest.mark.slow
def test_deferred_matches_inline_no_sun_dedup():
    # dedup off: every ReSTIR winner rides the queue (full segments)
    w, h = 32, 32
    _, scene = build_cornell_scene(tess=4, sphere_tess=(8, 12),
                                   blas_leaf_size=8)
    pscene = wk.prepare_wide(tk.prepare(scene))
    base = RenderConfig(spp=1, max_depth=2, rng_lock_noise=0,
                        dedup_sun_shadow=False)
    out = {}
    for defer in (False, True):
        cfg = dataclasses.replace(base, deferred_shadows=defer)
        out[defer] = _run(cfg, scene, pscene, w, h)
    np.testing.assert_allclose(out[True][0], out[False][0],
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_array_equal(out[True][1], out[False][1])


def test_deferred_ignored_off_pallas_path():
    # XLA-tracer path (pscene=None): the knob must be a no-op (while-loop
    # lane bounds), so results are BIT-identical there
    w, h = 32, 32
    _, scene = build_cornell_scene(tess=2, sphere_tess=(6, 8),
                                   blas_leaf_size=8)
    base = RenderConfig(spp=1, max_depth=2, rng_lock_noise=0)
    out = {}
    for defer in (False, True):
        cfg = dataclasses.replace(base, deferred_shadows=defer)
        out[defer] = _run(cfg, scene, None, w, h)
    np.testing.assert_array_equal(out[True][0], out[False][0])
