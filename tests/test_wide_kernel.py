"""8-wide packet kernel vs the XLA reference traversal (interpret mode)."""

import numpy as np

from ilgpu_raytracing_tpu.models.camera import Camera
from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene, cornell_camera
from ilgpu_raytracing_tpu.models.scene import build_default_scene
from ilgpu_raytracing_tpu.ops import rays, traverse
from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk


def test_wide_sphere_scene_exact():
    _, scene = build_default_scene(single_instance=True)
    ws = wk.prepare_wide(tk.prepare(scene))
    cam = Camera.create(64, 48)
    o, d = rays.generate_primary_rays(cam, 64, 48)
    h_ref = traverse.trace_closest(scene, o, d)
    h_w = wk.trace_closest_wide(ws, o, d, interpret=True)
    m = np.asarray(h_ref.hit)
    np.testing.assert_array_equal(m, np.asarray(h_w.hit))
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_w.t)[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.prim)[m], np.asarray(h_w.prim)[m]
    )


def test_wide_multi_instance():
    _, scene = build_default_scene(single_instance=False)
    ws = wk.prepare_wide(tk.prepare(scene))
    assert len(ws.meta) == 6
    cam = Camera.create(48, 32)
    o, d = rays.generate_primary_rays(cam, 48, 32)
    h_ref = traverse.trace_closest(scene, o, d)
    h_w = wk.trace_closest_wide(ws, o, d, interpret=True)
    m = np.asarray(h_ref.hit)
    np.testing.assert_array_equal(m, np.asarray(h_w.hit))
    np.testing.assert_array_equal(
        np.asarray(h_ref.inst)[m], np.asarray(h_w.inst)[m]
    )


def test_wide_cornell_near_exact():
    _, cs = build_cornell_scene(tess=4, sphere_tess=(8, 12))
    ws = wk.prepare_wide(tk.prepare(cs))
    cam = cornell_camera(64, 48)
    o, d = rays.generate_primary_rays(cam, 64, 48)
    h_ref = traverse.trace_closest(cs, o, d)
    h_w = wk.trace_closest_wide(ws, o, d, interpret=True)
    tr = np.asarray(h_ref.t)
    tw = np.asarray(h_w.t)
    mismatch = np.abs(tr - tw) > 1e-3 * np.minimum(np.abs(tr), 1e6)
    assert mismatch.mean() < 0.005
    occ_r = traverse.shadow_occlusion(cs, o, d, 5.0)
    occ_w = wk.shadow_occlusion_wide(ws, o, d, 5.0, interpret=True)
    assert (np.asarray(occ_r) == np.asarray(occ_w)).mean() > 0.995


def test_wide_collapse_covers_all_leaves():
    """Every binary leaf must appear exactly once among wide-node children."""
    _, cs = build_cornell_scene(tess=4, sphere_tess=(8, 12), blas_leaf_size=8)
    ps = tk.prepare(cs)
    ws = wk.prepare_wide(ps)
    ifl = np.asarray(ps.node_ifields).reshape(-1, 4)
    binary_leaves = {
        (int(ifl[i, 1]), int(ifl[i, 2]))
        for i in range(ifl.shape[0])
        if ifl[i, 2] > 0
    }
    wc = np.asarray(ws.wide_child)
    wide_leaves = []
    for v in wc[wc <= -2]:
        packed = -int(v) - 2
        wide_leaves.append((packed // 16, packed % 16))
    assert sorted(wide_leaves) == sorted(binary_leaves)


def test_stack_bound_and_front_scratch_sizing():
    """Per-scene stack bound is computed at prepare and the front>FRONT
    public kwarg gets correctly sized scratch (round-2 advisor finding)."""
    import numpy as np

    from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
    from ilgpu_raytracing_tpu.ops import traverse

    _, scene = build_cornell_scene(tess=4, sphere_tess=(8, 12), blas_leaf_size=8)
    ws = wk.prepare_wide(tk.prepare(scene))
    assert 64 <= ws.stack_cap <= 16384
    # the all-hit simulation dominates any real walk: sanity that it covers
    # at least one full 8-wide fanout
    wc_all = np.asarray(ws.wide_child).reshape(-1, wk.WIDTH)
    assert ws.stack_cap >= min(8, (wc_all >= 0).sum(axis=1).max()) + 1

    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    o = jnp.asarray(rs.uniform(-0.5, 0.5, (256, 3)).astype(np.float32))
    d = jnp.asarray(rs.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = traverse.trace_closest(scene, o, d)
    got = wk.trace_closest_wide(ws, o, d, front=wk.MAX_FRONT)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-5
    )


def test_wide_bary_epilogue_matches_oracle():
    """bu/bv are recomputed outside the kernel (XLA gather + MT epilogue on
    the packed two-ref hit record); they must match the XLA oracle exactly
    on lanes where both agree on the winning primitive, and stay zero on
    sphere hits and misses."""
    for builder, camf in (
        (lambda: build_cornell_scene(tess=4, sphere_tess=(8, 12))[1],
         lambda: cornell_camera(64, 48)),
        (lambda: build_default_scene(single_instance=False)[1],
         lambda: Camera.create(64, 48)),
    ):
        scene = builder()
        # texture/alpha-free scenes prepare with needs_bary=False (decode
        # then returns zero bary); force the epilogue on to validate it
        ws = wk.prepare_wide(tk.prepare(scene)).replace(needs_bary=True)
        cam = camf()
        o, d = rays.generate_primary_rays(cam, 64, 48)
        h_ref = traverse.trace_closest(scene, o, d)
        h_w = wk.trace_closest_wide(ws, o, d, interpret=True)
        same = (
            np.asarray(h_ref.hit)
            & np.asarray(h_w.hit)
            & (np.asarray(h_ref.prim) == np.asarray(h_w.prim))
            & (np.asarray(h_ref.kind) == np.asarray(h_w.kind))
            & (np.asarray(h_ref.inst) == np.asarray(h_w.inst))
        )
        tri = same & (np.asarray(h_ref.kind) == traverse.KIND_TRI)
        if tri.any():
            np.testing.assert_allclose(
                np.asarray(h_w.bu)[tri], np.asarray(h_ref.bu)[tri],
                rtol=0, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(h_w.bv)[tri], np.asarray(h_ref.bv)[tri],
                rtol=0, atol=1e-6,
            )
        # zero-bary contract is on the RECORDED primitive (a lane can carry
        # a recorded near-degenerate hit with t >= T_HIT_MAX whose .hit is
        # False -- same as the five-ref kernel and the oracle)
        rec_tri = (np.asarray(h_w.prim) >= 0) & (
            np.asarray(h_w.kind) == traverse.KIND_TRI
        )
        np.testing.assert_array_equal(np.asarray(h_w.bu)[~rec_tri], 0.0)
        np.testing.assert_array_equal(np.asarray(h_w.bv)[~rec_tri], 0.0)


def test_needs_bary_flag_and_skip_is_image_safe(tmp_path):
    """needs_bary gating: texture/alpha-free scenes prepare with
    needs_bary=False and the decode returns zero bary (the only consumers
    -- shade_hits UV interpolation and alpha map_d tests -- never read it
    on such scenes: dtex < 0 selects kd before the uu/vv mix,
    traverse.py:451-455). A scene with an alpha-cutout material must flag
    needs_bary=True. Full-frame safety of the skip is covered by the
    golden render tests, which run texture-free scenes through this path."""
    scene = build_cornell_scene(tess=4, sphere_tess=(8, 12))[1]
    ps = tk.prepare(scene)
    assert ps.needs_bary is False
    ws = wk.prepare_wide(ps)
    assert ws.needs_bary is False

    cam = cornell_camera(64, 48)
    o, d = rays.generate_primary_rays(cam, 64, 48)
    h = wk.trace_closest_wide(ws, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(h.bu), 0.0)
    np.testing.assert_array_equal(np.asarray(h.bv), 0.0)
    # t/prim/inst/kind unaffected by the skip
    h_full = wk.trace_closest_wide(
        ws.replace(needs_bary=True), o, d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(h.t), np.asarray(h_full.t))
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(h_full.prim))

    # shading output identical with and without bary on this scene class
    s0 = traverse.shade_hits(scene, h, o, d)
    s1 = traverse.shade_hits(scene, h_full, o, d)
    np.testing.assert_array_equal(np.asarray(s0.albedo), np.asarray(s1.albedo))

    # alpha scenes must keep bary
    from ilgpu_raytracing_tpu.models.sponza_like import build_sponza_like_scene

    sp_scene = build_sponza_like_scene(str(tmp_path / "asset"))[1]
    assert sp_scene.has_alpha
    assert tk.prepare(sp_scene).needs_bary is True
