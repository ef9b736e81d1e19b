import numpy as np

from ilgpu_raytracing_tpu.config import RenderConfig
from ilgpu_raytracing_tpu.runtime.controller import InputState
from ilgpu_raytracing_tpu.runtime.interactive import (
    EventPump,
    InteractiveSession,
    scripted_input,
)
from ilgpu_raytracing_tpu.runtime.renderer import Renderer


def test_interactive_scripted_session():
    r = Renderer(out_w=48, out_h=32, cfg=RenderConfig(spp=1, max_depth=1))
    script = [
        InputState(w=True),
        InputState(mouse_dx=40.0),
        InputState(d=True, shift=True),
        InputState(scroll_dy=2.0),
    ]
    presented = []
    sess = InteractiveSession(
        r, scripted_input(script),
        presenter=lambda rgb, hud: presented.append((rgb.copy(), hud)),
    )
    n = sess.run()
    assert n == 4
    assert len(presented) == 4
    # camera actually moved between frames
    assert not np.allclose(presented[0][0], presented[-1][0])
    # a second run replays the script from the start
    assert sess.run(max_frames=2) == 2


def test_event_pump_semantics():
    """Window-event plumbing (RTWindow.cs:131-146, 255-314): capture toggle
    on E, captured-only mouse deltas, per-poll delta consume, key holds."""
    p = EventPump()
    # held keys + modifiers survive across polls until released
    p.key_down("w")
    p.key_down("Shift_L")
    inp = p.poll()
    assert inp.w and inp.shift and inp.captured
    p.key_up("w")
    p.key_up("Shift_L")
    # mouse deltas accumulate while captured; first motion only sets the
    # reference position
    p.mouse_move(100, 100)
    p.mouse_move(110, 95)
    p.mouse_move(112, 95)
    inp = p.poll()
    assert inp.mouse_dx == 12.0 and inp.mouse_dy == -5.0
    assert not inp.w and not inp.shift
    # deltas are consumed by poll
    assert p.poll().mouse_dx == 0.0
    # E toggles capture; uncaptured motion is ignored
    p.key_down("e")
    p.mouse_move(0, 0)
    p.mouse_move(50, 50)
    inp = p.poll()
    assert not inp.captured and inp.mouse_dx == 0.0
    p.key_down("e")
    assert p.poll().captured
    # scroll accumulates and consumes
    p.scroll(1.0)
    p.scroll(1.0)
    assert p.poll().scroll_dy == 2.0
    # Escape / close ends the session
    p.key_down("Escape")
    assert p.poll() is None


def test_event_pump_drives_session():
    """A human-input session goes through EventPump.poll as the provider —
    the exact path TkInputWindow uses."""
    r = Renderer(out_w=48, out_h=32, cfg=RenderConfig(spp=1, max_depth=1))
    p = EventPump()
    events = {
        0: lambda: p.key_down("w"),
        1: lambda: (p.mouse_move(0, 0), p.mouse_move(30, 10)),
        2: lambda: p.close(),
    }

    def provider(frame: int):
        ev = events.get(frame)
        if ev is not None:
            ev()
        return p.poll()

    start_origin = np.asarray(r.camera.origin).copy()
    sess = InteractiveSession(r, provider)
    assert sess.run() == 2
    assert not np.allclose(np.asarray(r.camera.origin), start_origin)


def test_many_instances_stress():
    """Instance-scan traversal correctness over a 5x5x2 grid of instances
    (the reference TLAS capability exercised at instance counts well beyond
    the default scene)."""
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.materials import Material
    from ilgpu_raytracing_tpu.models.scene import SceneBuilder, translation_affine
    from ilgpu_raytracing_tpu.ops import brute, traverse

    b = SceneBuilder()
    b.add_material(Material(kd=(0.7, 0.7, 0.7)))
    sid = b.add_sphere((0, 0, 0), 0.4)
    tet_v = np.array([[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]], np.float32)
    tet_t = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    n_inst = 0
    for i in range(5):
        for j in range(5):
            t = (i * 1.2 - 2.4, 0.0, j * 1.2 - 2.4)
            if (i + j) % 2 == 0:
                b.add_sphere_instance([sid], translation_affine(t))
            else:
                b.add_mesh_instance(
                    tet_v, tet_t, object_to_world=translation_affine(t)
                )
            n_inst += 1
    scene = b.commit()
    assert scene.inst_o2w.shape[0] == 25

    rs = np.random.RandomState(0)
    o = jnp.asarray(rs.randn(512, 3).astype(np.float32) * 3)
    d = jnp.asarray(rs.randn(512, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h = traverse.trace_closest(scene, o, d)
    h_ref = brute.trace_closest_brute(scene, o, d)
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h_ref.hit))
    np.testing.assert_allclose(
        np.asarray(h.t), np.asarray(h_ref.t), rtol=1e-4, atol=1e-4
    )
    assert int(np.asarray(h.hit).sum()) > 20
