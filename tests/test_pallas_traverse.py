"""Pallas packet-traversal kernel vs the XLA reference traversal.

Runs in interpret mode on CPU. Exact agreement is not expected on
knife's-edge hits (rays within float-epsilon of triangle edges round
differently under different op fusion), so triangle scenes assert
near-total agreement with edge-case tolerance; sphere scenes are exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.models.camera import Camera
from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene, cornell_camera
from ilgpu_raytracing_tpu.models.scene import build_default_scene
from ilgpu_raytracing_tpu.ops import rays, traverse
from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk


def test_supports_scene_gate():
    _, scene = build_default_scene()
    assert tk.supports_scene(scene)


def test_sphere_scene_exact():
    _, scene = build_default_scene(single_instance=True)
    ps = tk.prepare(scene)
    cam = Camera.create(64, 48)
    o, d = rays.generate_primary_rays(cam, 64, 48)
    h_ref = traverse.trace_closest(scene, o, d)
    h_pal = tk.trace_closest_pallas(ps, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pal.hit))
    m = np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_pal.t)[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.prim)[m], np.asarray(h_pal.prim)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.kind)[m], np.asarray(h_pal.kind)[m]
    )


def test_multi_instance_sphere_scene():
    _, scene = build_default_scene(single_instance=False)  # 6 instances
    ps = tk.prepare(scene)
    assert len(ps.meta) == 6
    cam = Camera.create(48, 32)
    o, d = rays.generate_primary_rays(cam, 48, 32)
    h_ref = traverse.trace_closest(scene, o, d)
    h_pal = tk.trace_closest_pallas(ps, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pal.hit))
    m = np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_pal.t)[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.inst)[m], np.asarray(h_pal.inst)[m]
    )


def test_cornell_near_exact():
    _, cs = build_cornell_scene(tess=4, sphere_tess=(8, 12))
    ps = tk.prepare(cs)
    cam = cornell_camera(64, 48)
    o, d = rays.generate_primary_rays(cam, 64, 48)
    h_ref = traverse.trace_closest(cs, o, d)
    h_pal = tk.trace_closest_pallas(ps, o, d, interpret=True)
    tr = np.asarray(h_ref.t)
    tp = np.asarray(h_pal.t)
    mismatch = np.abs(tr - tp) > 1e-3 * np.minimum(np.abs(tr), 1e6)
    assert mismatch.mean() < 0.005, f"{mismatch.sum()} mismatched rays"
    agree = ~mismatch & np.asarray(h_ref.hit)
    np.testing.assert_allclose(tr[agree], tp[agree], rtol=1e-4)
    # coplanar quad diagonals: a ray on the shared edge may legitimately
    # resolve to either triangle (same t) under different rounding
    assert (np.asarray(h_ref.prim)[agree] == np.asarray(h_pal.prim)[agree]).mean() > 0.99


def test_shadow_near_exact():
    _, cs = build_cornell_scene(tess=4, sphere_tess=(8, 12))
    ps = tk.prepare(cs)
    cam = cornell_camera(48, 32)
    o, d = rays.generate_primary_rays(cam, 48, 32)
    occ_ref = traverse.shadow_occlusion(cs, o, d, 5.0)
    occ_pal = tk.shadow_occlusion_pallas(ps, o, d, 5.0, interpret=True)
    agree = (np.asarray(occ_ref) == np.asarray(occ_pal)).mean()
    assert agree > 0.995, f"shadow agreement {agree}"


def test_active_mask_and_padding():
    _, scene = build_default_scene(single_instance=True)
    ps = tk.prepare(scene)
    cam = Camera.create(40, 30)  # 1200 rays: not a multiple of the tile
    o, d = rays.generate_primary_rays(cam, 40, 30)
    active = jnp.arange(1200) % 2 == 0
    h = tk.trace_closest_pallas(ps, o, d, active=active, interpret=True)
    hits = np.asarray(h.hit)
    assert not hits[1::2].any()  # masked lanes always miss
    h_ref = traverse.trace_closest(scene, o, d)
    np.testing.assert_array_equal(hits[::2], np.asarray(h_ref.hit)[::2])
