import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilgpu_raytracing_tpu.parallel import sharding as shrd


def test_mesh_and_placement():
    assert len(jax.devices()) == 8, "conftest must simulate 8 CPU devices"
    mesh = shrd.make_mesh(8)
    x = jnp.arange(64.0)
    xs = shrd.shard_pixels(mesh, {"a": x})["a"]
    assert xs.sharding.is_equivalent_to(shrd.pixel_sharding(mesh), ndim=1)
    r = shrd.replicate(mesh, x)
    assert r.sharding.is_equivalent_to(shrd.replicated(mesh), ndim=1)


def test_check_divisible():
    mesh = shrd.make_mesh(8)
    shrd.check_divisible(64, mesh)
    with pytest.raises(ValueError):
        shrd.check_divisible(63, mesh)


def test_sharded_render_matches_single_device():
    """The full frame step under an 8-device mesh must produce the same
    image as unsharded execution (GSPMD inserts the collectives)."""
    import __graft_entry__ as ge

    step, args = ge._flagship(32, 16)
    packed_single, state_single, aux_single = step(*args)

    mesh = shrd.make_mesh(8)
    scene, cam, prev, state, frame, key, sun, reset = args
    scene_r = shrd.replicate(mesh, scene)
    state_s = shrd.shard_state(mesh, state)
    packed_multi, state_multi, aux_multi = step(
        scene_r, cam, prev, state_s, frame, key, sun, reset
    )
    np.testing.assert_array_equal(
        np.asarray(packed_single), np.asarray(packed_multi)
    )
    np.testing.assert_allclose(
        np.asarray(aux_single["color"]), np.asarray(aux_multi["color"]),
        rtol=1e-5, atol=1e-6,
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None
