import math

import numpy as np

from ilgpu_raytracing_tpu.models.camera import Camera


def _center_dir(cam: Camera) -> np.ndarray:
    c = cam.lower_left + cam.horizontal * 0.5 + cam.vertical * 0.5 - cam.origin
    return c / np.linalg.norm(c)


def test_default_pose():
    cam = Camera.create(1280, 720, 60.0)
    np.testing.assert_allclose(cam.origin, [0, 1, 3], atol=1e-6)
    want = np.array([0, 0.5, 0]) - np.array([0, 1, 3])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(_center_dir(cam), want, atol=1e-6)
    np.testing.assert_allclose(float(cam.fov_y), math.radians(60.0), atol=1e-5)
    np.testing.assert_allclose(float(cam.aspect), 1280 / 720, atol=1e-5)


def test_translate_preserves_direction():
    cam = Camera.create(640, 480)
    moved = cam.translate([1.0, 0.0, -4.0])
    np.testing.assert_allclose(_center_dir(moved), _center_dir(cam), atol=1e-6)
    np.testing.assert_allclose(moved.origin, cam.origin + [1, 0, -4], atol=1e-6)


def test_yaw_360_roundtrip():
    cam = Camera.create(640, 480)
    c = cam
    for _ in range(8):
        c = c.rotate_yaw_pitch(45.0, 0.0)
    np.testing.assert_allclose(_center_dir(c), _center_dir(cam), atol=1e-4)
    np.testing.assert_allclose(c.origin, cam.origin, atol=1e-6)


def test_pitch_changes_forward_only():
    cam = Camera.create(640, 480)
    c = cam.rotate_yaw_pitch(0.0, 10.0)
    # right vector unchanged by pure pitch
    np.testing.assert_allclose(c.right, cam.right, atol=1e-5)
    assert not np.allclose(c.forward, cam.forward)


def test_set_fov_changes_extent():
    cam = Camera.create(640, 480, 60.0)
    wide = cam.set_fov(100.0, float(cam.aspect))
    assert np.linalg.norm(wide.vertical) > np.linalg.norm(cam.vertical)
    np.testing.assert_allclose(float(wide.fov_y), math.radians(100.0), atol=1e-5)
    np.testing.assert_allclose(_center_dir(wide), _center_dir(cam), atol=1e-5)


def test_fly_forward_is_horizontal():
    cam = Camera.create(640, 480)  # looking slightly down
    moved = cam.fly(forward_axis=1.0, dt=1.0, speed=2.0)
    delta = moved.origin - cam.origin
    np.testing.assert_allclose(delta[1], 0.0, atol=1e-6)  # horizontal only
    np.testing.assert_allclose(np.linalg.norm(delta), 2.0, atol=1e-5)


def test_camera_is_pytree():
    import jax

    cam = Camera.create(64, 64)
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 9
    cam2 = jax.tree_util.tree_map(lambda x: x, cam)
    np.testing.assert_allclose(cam2.origin, cam.origin)
