"""Treelet-binned traversal (ops/treelet.py + pallas/treelet_kernel.py)
vs the XLA oracle and the wide kernel (interpret mode).

The treelet path must return the same closest hits as the flat wide-kernel
walk: it visits the same leaves, just grouped by treelet rounds with
per-lane t_max carried between rounds (the standard closest-hit pruning
argument at treelet granularity). Reference analog: per-thread divergent
traversal, SceneDeviceViews.cs:30-86."""

import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.models.camera import Camera
from ilgpu_raytracing_tpu.models.cornell import (
    build_cornell_scene,
    cornell_camera,
)
from ilgpu_raytracing_tpu.models.scene import build_default_scene
from ilgpu_raytracing_tpu.ops import rays, traverse
from ilgpu_raytracing_tpu.ops import treelet as treelet_mod
from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
from ilgpu_raytracing_tpu.ops.pallas import treelet_kernel as tlk
from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk


def _scatter_rays(scene, cam, w, h, seed=11):
    """Bounce-like population: origins on primary hit surfaces, random
    directions, dead lanes where the primary missed."""
    o, d = rays.generate_primary_rays(cam, w, h)
    hit = traverse.trace_closest(scene, o, d)
    surf = traverse.shade_hits(scene, hit, o, d)
    rs = np.random.RandomState(seed)
    nd = rs.normal(size=(o.shape[0], 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
    bo = np.asarray(surf.pos + surf.normal * 1e-3)
    return (
        jnp.asarray(bo), jnp.asarray(nd),
        jnp.asarray(np.asarray(hit.hit)),
    )


def test_cut_partitions_leaf_rows():
    """Every packed leaf row of every instance lands in exactly one
    treelet (cut completeness: the rounds scheme may only re-group leaf
    visits, never lose geometry)."""
    _, scene = build_cornell_scene(tess=8, sphere_tess=(12, 16),
                                   blas_leaf_size=8)
    ws = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(ws, 32)
    assert 2 <= ts.n_treelets <= 32

    wc_all = np.asarray(ts.wscene.wide_child).reshape(-1, wk.WIDTH)
    troot = np.asarray(ts.t_root)[: ts.n_treelets]

    def leaf_rows_of(w):
        out = []
        stack = [int(w)]
        while stack:
            x = stack.pop()
            for c in wc_all[x]:
                if c >= 0:
                    stack.append(int(c))
                elif c <= -2:
                    out.append((-int(c) - 2) >> 4)
        return out

    seen: list[int] = []
    for r in troot:
        assert r >= 0  # every root is walkable (leaf roots are wrapped)
        seen += leaf_rows_of(r)
    assert len(seen) == len(set(seen)), "leaf row in two treelets"
    # compare against the full instance walks on the ORIGINAL wide scene
    all_rows = []
    for _kind, root, _w2o, _wb, _iid in ws.meta:
        all_rows += leaf_rows_of(root)
    assert sorted(seen) == sorted(all_rows)


def test_treelet_matches_wide_cornell_scatter():
    """Bounce-population equality on the bench scene class (tri-only,
    identity transform): t bit-equal to the wide kernel, prim equal."""
    _, scene = build_cornell_scene(tess=8, sphere_tess=(12, 16),
                                   blas_leaf_size=8)
    ws = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(ws, 24)
    assert ts.all_identity

    o, d, active = _scatter_rays(scene, cornell_camera(64, 48), 64, 48)
    h_w = wk.trace_closest_wide(ws, o, d, active=active, interpret=True)
    h_t = treelet_mod.trace_closest_treelet(
        ts, o, d, active=active, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h_w.hit), np.asarray(h_t.hit))
    m = np.asarray(h_w.hit)
    np.testing.assert_array_equal(
        np.asarray(h_w.t)[m], np.asarray(h_t.t)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(h_w.prim)[m], np.asarray(h_t.prim)[m]
    )
    # inactive lanes report misses
    np.testing.assert_array_equal(np.asarray(h_t.hit)[~np.asarray(active)],
                                  False)


def test_treelet_matches_wide_default_scene():
    """Multi-instance scene with sphere sets and non-identity transforms:
    exercises the dynamic per-treelet w2o + kind-branched drain."""
    _, scene = build_default_scene(single_instance=False)
    ws = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(ws, 16)
    assert len(ts.inst_spans) == len(ws.meta)

    cam = Camera.create(48, 32)
    o, d = rays.generate_primary_rays(cam, 48, 32)
    h_w = wk.trace_closest_wide(ws, o, d, interpret=True)
    h_t = treelet_mod.trace_closest_treelet(ts, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_w.hit), np.asarray(h_t.hit))
    m = np.asarray(h_w.hit)
    np.testing.assert_array_equal(np.asarray(h_w.t)[m], np.asarray(h_t.t)[m])
    np.testing.assert_array_equal(
        np.asarray(h_w.inst)[m], np.asarray(h_t.inst)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(h_w.kind)[m], np.asarray(h_t.kind)[m]
    )


def test_treelet_single_matches_wide():
    """Single-dispatch variant (per-lane full candidate masks, one kernel
    launch) returns the wide kernel's exact hits on the bounce population
    and on the multi-instance scene."""
    _, scene = build_cornell_scene(tess=8, sphere_tess=(12, 16),
                                   blas_leaf_size=8)
    ws = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(ws, 24)
    o, d, active = _scatter_rays(scene, cornell_camera(64, 48), 64, 48)
    t_w, pp_w = wk.trace_closest_wide_packed(
        ws, o, d, active=active, interpret=True
    )
    t_s, pp_s = treelet_mod.trace_closest_treelet_single(
        ts, o, d, active=active, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(pp_w), np.asarray(pp_s))

    _, scene2 = build_default_scene(single_instance=False)
    ws2 = wk.prepare_wide(tk.prepare(scene2))
    ts2 = tlk.prepare_treelets(ws2, 16)
    cam = Camera.create(48, 32)
    o2, d2 = rays.generate_primary_rays(cam, 48, 32)
    h_w = wk.trace_closest_wide(ws2, o2, d2, interpret=True)
    t2, pp2 = treelet_mod.trace_closest_treelet_single(
        ts2, o2, d2, interpret=True
    )
    h_s = wk.decode_wide_hits(ws2, o2, d2, t2, pp2)
    np.testing.assert_array_equal(np.asarray(h_w.hit), np.asarray(h_s.hit))
    m = np.asarray(h_w.hit)
    np.testing.assert_array_equal(np.asarray(h_w.t)[m], np.asarray(h_s.t)[m])


def test_treelet_t_max_cap():
    """Per-lane t_max semantics match the wide kernel (rounds carry the
    running t_best through the same contract)."""
    _, scene = build_cornell_scene(tess=4, sphere_tess=(8, 12),
                                   blas_leaf_size=8)
    ws = wk.prepare_wide(tk.prepare(scene))
    ts = tlk.prepare_treelets(ws, 8)
    o, d, active = _scatter_rays(scene, cornell_camera(32, 24), 32, 24)
    t_w, pp_w = wk.trace_closest_wide_packed(
        ws, o, d, active=active, t_max=1.5, interpret=True
    )
    t_t, pp_t = treelet_mod.trace_closest_treelet_packed(
        ts, o, d, active=active, t_max=1.5, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_t))
    np.testing.assert_array_equal(np.asarray(pp_w), np.asarray(pp_t))
