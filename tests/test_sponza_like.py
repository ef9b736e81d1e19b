"""End-to-end Sponza-class workload: procedural multi-material OBJ with
MTL, diffuse textures, and alpha-cutout banners, loaded through the REAL
parser path (add_obj_instance) and rendered by the production integrator.

This is the integrated counterpart of the piecewise tests in
test_obj_loader.py (MeshLoaderOBJ.cs:67-272 + Scene.cs:144-256 working
together)."""

import os

import numpy as np

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.models.sponza_like import (
    build_sponza_like_scene,
    sponza_camera,
)
from ilgpu_raytracing_tpu.ops import integrator, sky
from ilgpu_raytracing_tpu.ops.restir import Reservoirs
import pytest

pytestmark = pytest.mark.slow  # OBJ multi-material pipeline renders

_G = os.path.join(os.path.dirname(__file__), "goldens")


def _build(tmp_path):
    return build_sponza_like_scene(str(tmp_path / "asset"))


def test_asset_loads_with_all_features(tmp_path):
    _, scene = _build(tmp_path)
    # multi-material with remapped texture ids
    assert scene.mat_kd.shape[0] == 5
    assert scene.has_alpha  # banner material has map_d
    assert (np.asarray(scene.mat_diffuse_tex) >= 0).sum() == 2  # floor+banner
    assert (np.asarray(scene.mat_alpha_tex) >= 0).sum() == 1
    assert scene.tri_v0.shape[0] == 94  # quads fan-split deterministically
    # per-corner UVs actually tiled beyond [0,1] on the floor
    uv_max = max(
        np.asarray(scene.tri_uv1).max(), np.asarray(scene.tri_uv2).max()
    )
    assert uv_max > 1.5


def test_alpha_cutout_visible_through_holes(tmp_path):
    """Primary rays through banner holes must see the wall behind, rays
    hitting fabric must see the banner (in-traversal alpha test parity,
    SceneDeviceViews.cs:208-218)."""
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.ops import traverse

    _, scene = _build(tmp_path)
    # banner quad spans x in [-0.8, 0.8], y in [1.0, 2.4] at z = -3 (mat 3)
    # hole centers sit at texel (8, 8) of each 16px cell
    def ray_at(u, v):
        x = -0.8 + 1.6 * u
        y = 1.0 + 1.4 * v
        o = jnp.asarray([[x, y, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        return traverse.trace_closest(scene, o, d)

    hole = ray_at(8.5 / 64.0, 1.0 - 8.5 / 64.0)  # center of a punched hole
    fabric = ray_at(2.0 / 64.0, 1.0 - 2.5 / 64.0)  # solid fabric corner
    # hole: passes through the banner plane (z=-3) to the wall (z=-4)
    assert float(hole.t[0]) > 3.5
    # fabric: stops at the banner plane
    assert abs(float(fabric.t[0]) - 3.0) < 1e-2


def test_golden_sponza_like(tmp_path):
    _, scene = _build(tmp_path)
    w = h = 64
    cam = sponza_camera(w, h)
    # parity transport pinned (see tests/test_golden.py): the golden
    # snapshots the reference-exact estimator
    cfg = RenderConfig(spp=2, max_depth=3, shadow_rr_lum=0.0,
                       rr_start_depth=3)
    n = w * h
    sun = sky.sun_direction(cfg.sun_azimuth, cfg.sun_elevation)
    ra, rb = Reservoirs.empty(n), Reservoirs.empty(n)
    color = None
    for f in range(2):
        gb = integrator.primary_visibility(scene, cam, w, h)
        rp, rc = (ra, rb) if f % 2 == 0 else (rb, ra)
        color, _, _, rc, _ = integrator.path_trace(
            scene, gb, cam, cam, rp, rc, f, np.uint32(77), sun, cfg, w, h
        )
        if f % 2 == 0:
            rb = rc
        else:
            ra = rc
    got = np.asarray(color, np.float32)
    path = os.path.join(_G, "sponza_like_64.npy")
    want = np.load(path).astype(np.float32)
    diff = np.abs(got - want)
    assert diff.mean() < 0.02, f"mean drift {diff.mean():.4f}"
    assert (diff.max(axis=-1) > 0.1).mean() < 0.01
