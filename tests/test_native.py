import numpy as np
import pytest

from ilgpu_raytracing_tpu import native
from ilgpu_raytracing_tpu.models import bvh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scenecore unavailable"
)


def _random_boxes(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.randn(n, 3).astype(np.float32) * 5
    e = rs.rand(n, 3).astype(np.float32) * 0.5 + 0.01
    return (c - e).astype(np.float32), (c + e).astype(np.float32), c


def _walk_collect(nif, leaf_order):
    visited, prims = [], []
    cur = 0
    while cur != -1:
        visited.append(cur)
        left, first, count, skip = nif[cur]
        if count > 0:
            prims.extend(leaf_order[first : first + count].tolist())
            cur = skip
        else:
            cur = left
    return visited, prims


@pytest.mark.parametrize("method", ["median", "sah", "lbvh"])
def test_native_build_contract(method):
    for n in (1, 2, 7, 64, 1000):
        bmin, bmax, c = _random_boxes(n, seed=n)
        nb, nx, nif, order = bvh.build_skip_index_bvh(
            bmin, bmax, c, leaf_size=4, method=method, use_native=True
        )
        visited, prims = _walk_collect(nif, order)
        assert len(visited) == nif.shape[0]
        assert sorted(prims) == list(range(n))
        for i in range(nif.shape[0]):
            left, first, count, skip = nif[i]
            if count > 0:
                ids = order[first : first + count]
                assert (nb[i] <= bmin[ids].min(0) + 1e-5).all()
                assert (nx[i] >= bmax[ids].max(0) - 1e-5).all()
            else:
                assert left > i + 1 or left == i + 2 or left > 0
                assert nif[left][3] == i + 1  # left subtree skips to right root


def test_native_matches_python_traversal_results():
    """Native-built and python-built BVHs must produce identical closest
    hits (trees may differ; results must not)."""
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.materials import Material
    from ilgpu_raytracing_tpu.models.scene import SceneBuilder
    from ilgpu_raytracing_tpu.ops import traverse

    rs = np.random.RandomState(11)
    V = rs.randn(200, 3).astype(np.float32)
    T = rs.randint(0, 200, size=(6000, 3)).astype(np.int32)
    keep = (T[:, 0] != T[:, 1]) & (T[:, 1] != T[:, 2]) & (T[:, 0] != T[:, 2])
    T = T[keep]

    scenes = []
    for use_native in (False, True):
        import ilgpu_raytracing_tpu.models.bvh as bvh_mod

        orig = bvh_mod.build_skip_index_bvh
        try:
            bvh_mod.build_skip_index_bvh = (
                lambda a, b, c, ls, method="median", un=use_native, f=orig: f(
                    a, b, c, ls, method, un
                )
            )
            builder = SceneBuilder()
            builder.add_material(Material())
            builder.add_mesh_instance(V, T)
            scenes.append(builder.commit())
        finally:
            bvh_mod.build_skip_index_bvh = orig

    o = jnp.asarray(rs.randn(256, 3).astype(np.float32) * 2)
    d = jnp.asarray(rs.randn(256, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h_py = traverse.trace_closest(scenes[0], o, d)
    h_nat = traverse.trace_closest(scenes[1], o, d)
    np.testing.assert_array_equal(np.asarray(h_py.hit), np.asarray(h_nat.hit))
    np.testing.assert_allclose(
        np.asarray(h_py.t), np.asarray(h_nat.t), rtol=1e-5, atol=1e-5
    )


def test_native_refit_matches_python():
    bmin, bmax, c = _random_boxes(500, seed=3)
    nb, nx, nif, order = bvh.build_skip_index_bvh(
        bmin, bmax, c, leaf_size=4, use_native=True
    )
    shift = np.array([0.5, 1.5, -2.0], np.float32)
    nb_n, nx_n = native.refit_bvh(nif, order, bmin + shift, bmax + shift)
    nb_p, nx_p = bvh.refit_bvh(nif, order, bmin + shift, bmax + shift)
    np.testing.assert_allclose(nb_n, nb_p, atol=1e-5)
    np.testing.assert_allclose(nx_n, nx_p, atol=1e-5)


def test_native_triangle_bounds():
    rs = np.random.RandomState(5)
    v0 = rs.randn(100, 3).astype(np.float32)
    v1 = rs.randn(100, 3).astype(np.float32)
    v2 = rs.randn(100, 3).astype(np.float32)
    bmin, bmax, cen = native.triangle_bounds(v0, v1, v2)
    np.testing.assert_allclose(bmin, np.minimum(v0, np.minimum(v1, v2)), atol=1e-6)
    np.testing.assert_allclose(bmax, np.maximum(v0, np.maximum(v1, v2)), atol=1e-6)
    np.testing.assert_allclose(cen, (v0 + v1 + v2) / 3.0, atol=1e-5)


def test_native_build_speed_large():
    """1M-prim build must complete quickly (the python builder would take
    minutes -- this is why the native path exists)."""
    import time

    n = 1_000_000
    rs = np.random.RandomState(0)
    c = rs.rand(n, 3).astype(np.float32) * 100
    e = np.full((n, 3), 0.05, np.float32)
    t0 = time.time()
    nb, nx, nif, order = bvh.build_skip_index_bvh(
        c - e, c + e, c, leaf_size=4, method="sah", use_native=True
    )
    dt = time.time() - t0
    assert order.shape[0] == n
    assert nif.shape[0] > n // 4
    assert dt < 30.0, f"native build too slow: {dt:.1f}s"
