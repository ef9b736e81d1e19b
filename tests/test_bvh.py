import numpy as np

from ilgpu_raytracing_tpu.models import bvh


def _random_boxes(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.randn(n, 3).astype(np.float32) * 5
    e = rs.rand(n, 3).astype(np.float32) * 0.5 + 0.01
    return (c - e).astype(np.float32), (c + e).astype(np.float32), c


def _walk_collect(nif, leaf_order):
    """Follow the skip-index threading with an always-hit ray: must visit every
    node exactly once and enumerate every leaf prim exactly once."""
    visited = []
    prims = []
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


def test_build_small_and_walk_complete():
    for n in (1, 2, 3, 4, 5, 9, 33, 257):
        bmin, bmax, c = _random_boxes(n, seed=n)
        nb, nx, nif, order = bvh.build_skip_index_bvh(bmin, bmax, c, leaf_size=4)
        visited, prims = _walk_collect(nif, order)
        assert len(visited) == nif.shape[0]  # every node threaded exactly once
        assert sorted(prims) == list(range(n))  # every prim in exactly one leaf
        # parent bounds contain child prim bounds
        for node_i in range(nif.shape[0]):
            left, first, count, skip = nif[node_i]
            if count > 0:
                ids = order[first : first + count]
                assert (nb[node_i] <= bmin[ids].min(0) + 1e-6).all()
                assert (nx[node_i] >= bmax[ids].max(0) - 1e-6).all()


def test_right_subtree_emitted_first():
    """The left child's subtree must be able to skip to the right child's
    root: right root == node + 1 in emission order (Scene.cs:459-460)."""
    bmin, bmax, c = _random_boxes(64, seed=3)
    _, _, nif, order = bvh.build_skip_index_bvh(bmin, bmax, c, leaf_size=4)
    for i in range(nif.shape[0]):
        left, first, count, skip = nif[i]
        if count == 0:  # inner
            right = i + 1
            assert left > right  # left emitted after the whole right subtree
            # left subtree's root skip must be the right root
            assert nif[left][3] == right


def test_refit_matches_rebuild_bounds():
    bmin, bmax, c = _random_boxes(200, seed=7)
    nb, nx, nif, order = bvh.build_skip_index_bvh(bmin, bmax, c, leaf_size=4)
    # move prims, refit
    shift = np.array([1.5, -0.25, 3.0], dtype=np.float32)
    nb2, nx2 = bvh.refit_bvh(nif, order, bmin + shift, bmax + shift)
    np.testing.assert_allclose(nb2, nb + shift, atol=1e-5)
    np.testing.assert_allclose(nx2, nx + shift, atol=1e-5)


def test_leaf_size_respected():
    bmin, bmax, c = _random_boxes(100, seed=9)
    _, _, nif, _ = bvh.build_skip_index_bvh(bmin, bmax, c, leaf_size=4)
    counts = nif[:, 2]
    assert counts.max() <= 4
    assert (counts[counts > 0] >= 1).all()


def test_refit_mesh_instance_traversal():
    """Animated mesh: refit must produce the same hits as a fresh rebuild."""
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.materials import Material
    from ilgpu_raytracing_tpu.models.scene import SceneBuilder, refit_mesh_instance
    from ilgpu_raytracing_tpu.ops import traverse

    rs = np.random.RandomState(3)
    V = rs.randn(80, 3).astype(np.float32)
    T = rs.randint(0, 80, size=(120, 3)).astype(np.int32)
    keep = (T[:, 0] != T[:, 1]) & (T[:, 1] != T[:, 2]) & (T[:, 0] != T[:, 2])
    T = T[keep]

    b = SceneBuilder()
    b.add_material(Material())
    b.add_sphere((5, 0, 0), 1.0)
    b.add_sphere_instance([0])
    b.add_mesh_instance(V, T)
    scene = b.commit()

    V2 = (V + rs.randn(80, 3).astype(np.float32) * 0.3).astype(np.float32)
    scene_refit = refit_mesh_instance(b, scene, 1, V2)

    # oracle: rebuild from scratch with the moved vertices
    b2 = SceneBuilder()
    b2.add_material(Material())
    b2.add_sphere((5, 0, 0), 1.0)
    b2.add_sphere_instance([0])
    b2.add_mesh_instance(V2, T)
    scene_rebuilt = b2.commit()

    o = jnp.asarray(rs.randn(256, 3).astype(np.float32) * 2)
    d = jnp.asarray(rs.randn(256, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h1 = traverse.trace_closest(scene_refit, o, d)
    h2 = traverse.trace_closest(scene_rebuilt, o, d)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    np.testing.assert_allclose(
        np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5, atol=1e-5
    )
    # and a second compounding refit
    V3 = (V2 + 0.1).astype(np.float32)
    scene_refit2 = refit_mesh_instance(b, scene_refit, 1, V3)
    b3 = SceneBuilder()
    b3.add_material(Material())
    b3.add_sphere((5, 0, 0), 1.0)
    b3.add_sphere_instance([0])
    b3.add_mesh_instance(V3, T)
    h3 = traverse.trace_closest(scene_refit2, o, d)
    h4 = traverse.trace_closest(b3.commit(), o, d)
    np.testing.assert_allclose(
        np.asarray(h3.t), np.asarray(h4.t), rtol=1e-5, atol=1e-5
    )
