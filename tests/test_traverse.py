import jax
import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.models.camera import Camera
from ilgpu_raytracing_tpu.models.materials import Material
from ilgpu_raytracing_tpu.models.scene import (
    SceneBuilder,
    build_default_scene,
    scale_affine,
    translation_affine,
)
from ilgpu_raytracing_tpu.ops import brute, rays, traverse


def _default():
    _, scene = build_default_scene()
    return scene


def _primary(scene, w=64, h=48):
    cam = Camera.create(w, h).translate([1, 0, -4])
    return rays.generate_primary_rays(cam, w, h)


def test_traversal_matches_brute_force_default_scene():
    scene = _default()
    o, d = _primary(scene)
    hit_bvh = jax.jit(traverse.trace_closest)(scene, o, d)
    hit_ref = brute.trace_closest_brute(scene, o, d)
    np.testing.assert_array_equal(np.asarray(hit_bvh.hit), np.asarray(hit_ref.hit))
    np.testing.assert_allclose(
        np.asarray(hit_bvh.t), np.asarray(hit_ref.t), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hit_bvh.prim), np.asarray(hit_ref.prim))
    np.testing.assert_array_equal(np.asarray(hit_bvh.inst), np.asarray(hit_ref.inst))
    assert bool(np.asarray(hit_bvh.hit).any())  # scene actually visible


def _tetra_mesh():
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    tris = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], dtype=np.int32)
    return positions, tris


def test_traversal_matches_brute_force_mesh_scene():
    rs = np.random.RandomState(5)
    b = SceneBuilder()
    b.add_material(Material(kd=(0.7, 0.7, 0.7)))
    # a random triangle soup instance + a scaled/translated tetra instance
    V = rs.randn(60, 3).astype(np.float32)
    T = rs.randint(0, 60, size=(40, 3)).astype(np.int32)
    keep = (T[:, 0] != T[:, 1]) & (T[:, 1] != T[:, 2]) & (T[:, 0] != T[:, 2])
    T = T[keep]
    b.add_mesh_instance(V, T)
    pos, tris = _tetra_mesh()
    b.add_mesh_instance(pos, tris, object_to_world=scale_affine(2.0, (0.5, -0.25, 1.0)))
    # plus one sphere instance
    b.add_sphere((0, 0, 0), 0.8)
    b.add_sphere_instance([0], translation_affine((0, 0.5, -2)))
    scene = b.commit()

    o = jnp.asarray(rs.randn(512, 3).astype(np.float32) * 3)
    d = jnp.asarray(rs.randn(512, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    hit_bvh = jax.jit(traverse.trace_closest)(scene, o, d)
    hit_ref = brute.trace_closest_brute(scene, o, d)
    np.testing.assert_array_equal(np.asarray(hit_bvh.hit), np.asarray(hit_ref.hit))
    np.testing.assert_allclose(
        np.asarray(hit_bvh.t), np.asarray(hit_ref.t), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hit_bvh.prim), np.asarray(hit_ref.prim))
    assert int(np.asarray(hit_bvh.hit).sum()) > 10


def test_shadow_occlusion_matches_brute():
    scene = _default()
    o, d = _primary(scene, 48, 32)
    hit = traverse.trace_closest(scene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    # shadow rays toward a fixed sun from hit points, offset along normal
    sun = jnp.asarray([0.3, 0.8, 0.5])
    sun = sun / jnp.linalg.norm(sun)
    so = surf.pos + surf.normal * 0.0025
    sd = jnp.broadcast_to(sun, so.shape)
    occ_bvh = jax.jit(traverse.shadow_occlusion)(scene, so, sd, 1e29)
    occ_ref = brute.shadow_occlusion_brute(scene, so, sd, 1e29)
    mask = np.asarray(hit.hit)
    np.testing.assert_array_equal(
        np.asarray(occ_bvh)[mask], np.asarray(occ_ref)[mask]
    )


def test_shade_hits_attributes():
    scene = _default()
    o, d = _primary(scene, 64, 48)
    hit = traverse.trace_closest(scene, o, d)
    surf = jax.jit(traverse.shade_hits)(scene, hit, o, d)
    hits = np.asarray(hit.hit)
    n = np.asarray(surf.normal)
    # normals unit where hit
    np.testing.assert_allclose(
        np.linalg.norm(n[hits], axis=-1), 1.0, atol=1e-4
    )
    # geometric sanity: normals face the camera for primary hits on convex
    # spheres (ground sphere included)
    dn = np.asarray(jnp.sum(jnp.asarray(d) * surf.normal, axis=-1))
    assert (dn[hits] <= 1e-3).all()
    # sphere hits keep the -1 disocclusion key quirk
    np.testing.assert_array_equal(np.asarray(surf.obj_id)[hits], -1)
    # albedo in range
    alb = np.asarray(surf.albedo)
    assert alb.min() >= 0.0 and alb.max() <= 1.0 + 1e-6
    # glass sphere lane reports ior 1.5
    shading = np.asarray(surf.shading)
    ior = np.asarray(surf.ior)
    glass = shading == 2
    if glass.any():
        np.testing.assert_allclose(ior[glass], 1.5, atol=1e-3)


def test_instance_transform_t_scaling():
    """A sphere scaled 2x via its instance transform must report world t
    consistent with the analytic world-space sphere."""
    b = SceneBuilder()
    b.add_material(Material())
    b.add_sphere((0, 0, 0), 1.0)
    b.add_sphere_instance([0], scale_affine(2.0, (0, 0, -5)))
    scene = b.commit()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = traverse.trace_closest(scene, o, d)
    assert bool(np.asarray(hit.hit)[0])
    np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-4)  # 5 - 2*1
