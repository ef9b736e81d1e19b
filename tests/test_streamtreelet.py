"""Stream-kernel treelet rounds (ops/pallas/streamtreelet_kernel.py +
ops/treelet.trace_closest_treelet_stream_packed) vs the flat stream kernel
(interpret mode).

Same exactness contract as the VMEM treelet tests: rounds re-group the
flat kernel's leaf visits by treelet with per-lane t_max carried between
rounds, so hits must match bit-for-bit. The scene class is config 5's:
multi-row HBM leaves (models/terrain.py heightfield + a sphere set),
identity transforms. Reference analog: per-thread divergent traversal
over Sponza-scale content, SceneDeviceViews.cs:30-86 + Scene.cs:654-674."""

import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.models.terrain import (
    build_terrain_scene,
    terrain_camera,
)
from ilgpu_raytracing_tpu.ops import rays, traverse
from ilgpu_raytracing_tpu.ops import treelet as treelet_mod
from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as sk
from ilgpu_raytracing_tpu.ops.pallas import streamtreelet_kernel as tlsk


def _scene():
    _, scene = build_terrain_scene(grid_x=48, grid_z=24, blas_leaf_size=64)
    return scene, sk.prepare_stream(scene)


def _scatter_rays(scene, sscene, w=48, h=32, seed=5):
    cam = terrain_camera(w, h)
    o, d = rays.generate_primary_rays(cam, w, h)
    hit = sk.trace_closest_stream(sscene, o, d, interpret=True)
    surf = traverse.shade_hits(scene, hit, o, d)
    rs = np.random.RandomState(seed)
    nd = rs.normal(size=(o.shape[0], 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
    bo = np.asarray(surf.pos + surf.normal * 1e-3)
    return (
        jnp.asarray(bo), jnp.asarray(nd),
        jnp.asarray(np.asarray(hit.hit)),
    )


def test_stream_cut_partitions_leaf_rows():
    """Every HBM leaf row (and sphere row) of every instance lands in
    exactly one treelet; synthetic grouping nodes only re-group."""
    scene, sscene = _scene()
    sts = tlsk.prepare_treelets_stream(sscene, 16)
    assert 2 <= sts.n_treelets <= 16
    assert sts.any_spheres  # terrain carries a 2-sphere instance

    wc_all = np.asarray(sts.sscene.wide_child).reshape(-1, sk.WIDTH)
    troot = np.asarray(sts.t_root)[: sts.n_treelets]
    tinst = np.asarray(sts.t_inst)[: sts.n_treelets]

    def leaf_encs_of(w):
        out = []
        stack = [int(w)]
        while stack:
            x = stack.pop()
            for c in wc_all[x]:
                if c >= 0:
                    stack.append(int(c))
                elif c <= -2:
                    out.append(int(c))
        return out

    seen_by_kind: dict[int, list[int]] = {}
    for r, ie in zip(troot, tinst):
        assert r >= 0
        seen_by_kind.setdefault(int(ie) & 3, []).extend(leaf_encs_of(r))
    for kind, seen in seen_by_kind.items():
        assert len(seen) == len(set(seen)), "leaf in two treelets"
    all_by_kind: dict[int, list[int]] = {}
    for kind_b, root, _w2o, _wb, _iid in sscene.meta:
        from ilgpu_raytracing_tpu.models.scene import BLAS_TRI_MESH
        from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI

        k = KIND_TRI if kind_b == BLAS_TRI_MESH else KIND_SPHERE
        all_by_kind.setdefault(k, []).extend(leaf_encs_of(root))
    assert {k: sorted(v) for k, v in seen_by_kind.items()} == {
        k: sorted(v) for k, v in all_by_kind.items()
    }


def test_stream_treelet_matches_flat_scatter():
    """Bounce-population equality: t and packed prim|inst bit-equal to the
    flat stream kernel, dead lanes report misses."""
    scene, sscene = _scene()
    sts = tlsk.prepare_treelets_stream(sscene, 12)
    o, d, active = _scatter_rays(scene, sscene)
    t_f, pp_f = sk.trace_closest_stream_packed(
        sscene, o, d, active=active, interpret=True
    )
    t_t, pp_t = treelet_mod.trace_closest_treelet_stream_packed(
        sts, o, d, active=active, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_t))
    np.testing.assert_array_equal(np.asarray(pp_f), np.asarray(pp_t))
    miss = ~np.asarray(active)
    assert (np.asarray(pp_t)[miss] < 0).all()


def test_stream_treelet_primary_and_tmax():
    """Primary rays (hits spheres + terrain) and per-lane t_max cap both
    match the flat kernel; the cleanup_after hybrid is exact too."""
    scene, sscene = _scene()
    sts = tlsk.prepare_treelets_stream(sscene, 12)
    cam = terrain_camera(48, 32)
    o, d = rays.generate_primary_rays(cam, 48, 32)
    t_f, pp_f = sk.trace_closest_stream_packed(sscene, o, d, interpret=True)
    t_t, pp_t = treelet_mod.trace_closest_treelet_stream_packed(
        sts, o, d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_t))
    np.testing.assert_array_equal(np.asarray(pp_f), np.asarray(pp_t))

    t_f2, pp_f2 = sk.trace_closest_stream_packed(
        sscene, o, d, t_max=40.0, interpret=True
    )
    t_t2, pp_t2 = treelet_mod.trace_closest_treelet_stream_packed(
        sts, o, d, t_max=40.0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_f2), np.asarray(t_t2))
    np.testing.assert_array_equal(np.asarray(pp_f2), np.asarray(pp_t2))

    t_c, pp_c = treelet_mod.trace_closest_treelet_stream_packed(
        sts, o, d, interpret=True, cleanup_after=1
    )
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_c))
    np.testing.assert_array_equal(np.asarray(pp_f), np.asarray(pp_c))


def test_treelet_sort_key_dispatch_exact():
    """The production destination-treelet sort key
    (config.sort_stream_treelet_key -> sort._ray_perm treelet_bounds):
    sorted dispatch through sorted_closest_packed / sorted_shadow matches
    the unsorted flat kernel bit-for-bit, and prepare_stream ships the
    (T,6) key table."""
    from ilgpu_raytracing_tpu.ops import sort as sort_mod

    scene, sscene = _scene()
    assert sscene.sortkey_bounds is not None
    assert sscene.sortkey_bounds.shape[1] == 6
    o, d, active = _scatter_rays(scene, sscene, seed=9)
    t_f, pp_f = sk.trace_closest_stream_packed(
        sscene, o, d, active=active, interpret=True
    )
    hit = sort_mod.sorted_closest_packed(
        lambda oo, dd, act: sk.trace_closest_stream_packed(
            sscene, oo, dd, active=act, interpret=True),
        lambda t, pp: sk.decode_stream_hits(sscene, o, d, t, pp),
        o, d, active, None, sscene.sortkey_bounds,
    )
    flat = sk.decode_stream_hits(sscene, o, d, t_f, pp_f)
    np.testing.assert_array_equal(np.asarray(flat.hit), np.asarray(hit.hit))
    np.testing.assert_array_equal(np.asarray(flat.t), np.asarray(hit.t))
    np.testing.assert_array_equal(np.asarray(flat.prim),
                                  np.asarray(hit.prim))

    occ_f = sk.shadow_occlusion_stream(
        sscene, o, d, 1e29, active=active, interpret=True
    )
    occ_s = sort_mod.sorted_shadow(
        lambda oo, dd, act: sk.shadow_occlusion_stream(
            sscene, oo, dd, 1e29, active=act, interpret=True),
        o, d, active, None, sscene.sortkey_bounds,
    )
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_s))
