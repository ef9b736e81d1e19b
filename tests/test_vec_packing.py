import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.utils import packing, vec


def test_normalize_reflect_refract():
    rs = np.random.RandomState(0)
    v = jnp.asarray(rs.randn(64, 3).astype(np.float32))
    n = vec.normalize(v)
    np.testing.assert_allclose(np.asarray(vec.length(n)), 1.0, atol=1e-5)

    i = vec.normalize(jnp.asarray(rs.randn(64, 3).astype(np.float32)))
    r = vec.reflect(i, n)
    # reflection preserves length and flips the normal component
    np.testing.assert_allclose(np.asarray(vec.length(r)), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(vec.dot(r, n)), -np.asarray(vec.dot(i, n)), atol=1e-5
    )

    # refraction straight through at eta=1
    ok, t = vec.refract(i, -n * np.sign(np.asarray(vec.dot(i, n)))[:, None], 1.0, 1.0)
    assert bool(np.asarray(ok).all())

    # total internal reflection: grazing exit from dense medium
    i2 = vec.normalize(jnp.asarray([[1.0, -0.05, 0.0]]))
    n2 = jnp.asarray([[0.0, 1.0, 0.0]])
    ok2, _ = vec.refract(i2, n2, 1.5, 1.0)
    assert not bool(np.asarray(ok2)[0])


def test_snell_angle():
    # 45 degrees into glass (eta 1/1.5)
    i = vec.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    ok, t = vec.refract(i, n, 1.0, 1.5)
    assert bool(np.asarray(ok)[0])
    sin_in = np.sin(np.pi / 4)
    sin_out = float(np.asarray(vec.length(t[:, [0, 2]] * 1.0))[0])  # horizontal comp
    np.testing.assert_allclose(sin_out, sin_in / 1.5, atol=1e-5)


def test_schlick_limits():
    f0 = vec.schlick_fresnel(jnp.asarray(1.0), 1.0, 1.5)
    np.testing.assert_allclose(float(f0), ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)
    f_graze = vec.schlick_fresnel(jnp.asarray(0.0), 1.0, 1.5)
    np.testing.assert_allclose(float(f_graze), 1.0, atol=1e-6)


def test_orthonormal_basis():
    rs = np.random.RandomState(1)
    n = vec.normalize(jnp.asarray(rs.randn(128, 3).astype(np.float32)))
    t, b = vec.orthonormal_basis(n)
    np.testing.assert_allclose(np.asarray(vec.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.dot(b, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.length(b)), 1.0, atol=1e-4)


def test_safe_color():
    c = jnp.asarray([[np.nan, np.inf, -np.inf], [2e7, -2e7, 0.5]], dtype=jnp.float32)
    s = np.asarray(vec.safe_color(c))
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s[0], 0.0)
    np.testing.assert_allclose(s[1], [1e6, -1e6, 0.5])


def test_pack_unpack_rgba8_roundtrip():
    rs = np.random.RandomState(2)
    c = jnp.asarray(rs.rand(256, 3).astype(np.float32))
    p = packing.pack_rgba8(c)
    u = np.asarray(packing.unpack_rgb8(p))
    np.testing.assert_allclose(u, np.asarray(c), atol=1.0 / 255.0 + 1e-6)
    assert (np.asarray(p) >> 24 == 255).all()


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 256)
    rt = np.asarray(packing.srgb_to_linear(packing.linear_to_srgb(c)))
    np.testing.assert_allclose(rt, np.asarray(c), atol=1e-5)


def test_mat_id_pack():
    shade = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    ior = jnp.asarray([1.0, 1.0, 1.5], dtype=jnp.float32)
    packed = packing.pack_mat_id(shade, ior)
    s, i = packing.unpack_mat_id(packed)
    np.testing.assert_array_equal(np.asarray(s), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(i), [1.0, 1.0, 1.5], atol=1e-3)


def test_affine_transforms():
    # uniform scale 2 + translation
    m = jnp.asarray(
        [[2.0, 0, 0, 1.0], [0, 2.0, 0, 2.0], [0, 0, 2.0, 3.0]], dtype=jnp.float32
    )
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(vec.transform_point(m, p))[0], [3.0, 4.0, 5.0]
    )
    np.testing.assert_allclose(
        np.asarray(vec.transform_vector(m, p))[0], [2.0, 2.0, 2.0]
    )
