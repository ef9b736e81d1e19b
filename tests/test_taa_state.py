import jax.numpy as jnp
import numpy as np

from ilgpu_raytracing_tpu.ops import taa, upsample
from ilgpu_raytracing_tpu.runtime.framestate import FrameState
from ilgpu_raytracing_tpu.utils import packing


def _const_packed(n, rgb):
    c = jnp.broadcast_to(jnp.asarray(rgb, jnp.float32), (n, 3))
    return packing.pack_rgba8(c)


def test_taa_first_frame_passthrough_constant():
    in_w = in_h = 16
    out_w = out_h = 24
    low = _const_packed(in_w * in_h, (0.5, 0.25, 0.75))
    obj = jnp.zeros((in_w * in_h,), jnp.int32)
    hist_c = jnp.zeros((out_w * out_h,), jnp.uint32)
    hist_o = jnp.full((out_w * out_h,), -1, jnp.int32)
    out, new_hist, new_obj = taa.resolve_upsample(
        low, obj, hist_c, hist_o, False, in_w, in_h, out_w, out_h
    )
    rgb = np.asarray(packing.unpack_rgb8(out))
    # constant field survives reconstruction exactly (up to 8-bit rounding)
    np.testing.assert_allclose(
        rgb, np.broadcast_to([0.5, 0.25, 0.75], rgb.shape), atol=2.5 / 255
    )
    np.testing.assert_array_equal(np.asarray(new_hist), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(new_obj), 0)


def test_taa_history_blend_and_disocclusion():
    in_w = in_h = 8
    out_w = out_h = 8
    n = 64
    low_white = _const_packed(n, (1.0, 1.0, 1.0))
    low_black = _const_packed(n, (0.0, 0.0, 0.0))
    obj0 = jnp.zeros((n,), jnp.int32)
    obj1 = jnp.ones((n,), jnp.int32)

    # frame 0: black history established
    out0, h0, ho0 = taa.resolve_upsample(
        low_black, obj0, jnp.zeros((n,), jnp.uint32), jnp.full((n,), -1, jnp.int32),
        False, in_w, in_h, out_w, out_h,
    )
    # frame 1 same obj: white input clamped into black neighborhood?
    # neighborhood of constant white frame is white, so history(black) clamps
    # to white -> output white. This mirrors the reference's clamp behavior.
    out1, h1, _ = taa.resolve_upsample(
        low_white, obj0, h0, ho0, True, in_w, in_h, out_w, out_h
    )
    rgb1 = np.asarray(packing.unpack_rgb8(out1))
    np.testing.assert_allclose(rgb1, 1.0, atol=2 / 255)

    # disocclusion: same setup but neighborhood clamp can't save a real obj
    # change -- with objId mismatch, history resets to current exactly
    out2, _, _ = taa.resolve_upsample(
        low_white, obj1, h0, ho0, True, in_w, in_h, out_w, out_h
    )
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out1))


def test_taa_converges_to_constant_input():
    in_w = in_h = 8
    n = 64
    target = _const_packed(n, (0.8, 0.4, 0.2))
    obj = jnp.zeros((n,), jnp.int32)
    hist_c = _const_packed(n, (0.0, 0.0, 0.0))
    hist_o = jnp.zeros((n,), jnp.int32)
    out = None
    valid = True
    for _ in range(50):
        out, hist_c, hist_o = taa.resolve_upsample(
            target, obj, hist_c, hist_o, valid, in_w, in_h, 8, 8
        )
    rgb = np.asarray(packing.unpack_rgb8(out))
    np.testing.assert_allclose(
        rgb, np.broadcast_to([0.8, 0.4, 0.2], rgb.shape), atol=4 / 255
    )


def test_bilinear_upsample_constant():
    src = _const_packed(8 * 6, (0.2, 0.6, 1.0))
    dst = upsample.bilinear_upsample(src, 8, 6, 16, 12)
    rgb = np.asarray(packing.unpack_rgb8(dst))
    np.testing.assert_allclose(
        rgb, np.broadcast_to([0.2, 0.6, 1.0], rgb.shape), atol=2 / 255
    )
    # identity passthrough
    same = upsample.bilinear_upsample(src, 8, 6, 8, 6)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(src))


def test_framestate_save_load_roundtrip(tmp_path):
    st = FrameState.create(128, 256)
    st = st.replace(
        taa_color=jnp.arange(256, dtype=jnp.uint32),
        accum=jnp.ones((128, 3), jnp.float32) * 0.5,
        accum_count=jnp.asarray(7, jnp.int32),
        taa_valid=jnp.asarray(True),
    )
    p = str(tmp_path / "state.npz")
    st.save(p)
    st2 = FrameState.load(p)
    np.testing.assert_array_equal(np.asarray(st2.taa_color), np.arange(256))
    np.testing.assert_allclose(np.asarray(st2.accum), 0.5)
    assert int(st2.accum_count) == 7
    assert bool(st2.taa_valid)


def test_renderer_end_to_end_small():
    import jax

    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    r = Renderer(out_w=64, out_h=48, cfg=RenderConfig(spp=1, max_depth=2))
    packed = r.render_frames(2)
    arr = np.asarray(packed)
    assert arr.shape == (64 * 48,)
    assert (arr >> 24 == 255).all()  # alpha
    rgb = r.frame_rgb()
    assert rgb.shape == (48, 64, 3)
    assert rgb.std() > 1.0  # not a constant image

    # resize resets frame index and history
    r.resize(32, 32)
    assert r.frame == 0
    packed2 = r.render()
    assert np.asarray(packed2).shape == (32 * 32,)


def test_renderer_progressive_accumulation():
    from ilgpu_raytracing_tpu.config import RenderConfig
    from ilgpu_raytracing_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(
        spp=1, max_depth=2, progressive_accumulation=True, enable_taau=False,
        rng_lock_noise=1,
    )
    r = Renderer(out_w=48, out_h=48, cfg=cfg, tonemap_name="aces")
    r.render_frames(4)
    assert int(r.state.accum_count) == 4
    # camera move resets accumulation
    r.set_camera(r.camera.translate([0.1, 0, 0]))
    r.render()
    assert int(r.state.accum_count) == 1


def test_framestate_load_pre_W_snapshot(tmp_path):
    """Snapshots saved before the reservoir W slot existed must still load
    (W falls back to zeros, matching Reservoirs.empty)."""
    import numpy as np

    from ilgpu_raytracing_tpu.runtime.framestate import FrameState

    st = FrameState.create(16, 64)
    p = str(tmp_path / "state.npz")
    st.save(p)
    z = dict(np.load(p))
    del z["res_prev_W"], z["res_cur_W"]
    old = str(tmp_path / "old_state.npz")
    np.savez(old, **z)
    loaded = FrameState.load(old)
    assert loaded.res_prev.W.shape == (16,)
    assert float(np.asarray(loaded.res_prev.W).sum()) == 0.0
