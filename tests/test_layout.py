"""Block-linear layout: index math roundtrips and pipeline consistency."""

import numpy as np
import jax.numpy as jnp

from ilgpu_raytracing_tpu.ops import layout, rays


def test_roundtrip_blocked():
    w, h = 192, 128
    assert layout.is_blocked(w, h)
    pos = jnp.arange(w * h, dtype=jnp.int32)
    x, y = layout.xy_from_position(pos, w, h)
    x, y = np.asarray(x), np.asarray(y)
    # bijection onto the pixel grid
    assert sorted(zip(x.tolist(), y.tolist())) == [
        (xx, yy) for xx in range(w) for yy in range(h)
    ]
    back = np.asarray(layout.position_from_xy(x, y, w, h))
    assert (back == np.asarray(pos)).all()


def test_roundtrip_identity():
    w, h = 48, 32  # not block multiples -> row-major
    assert not layout.is_blocked(w, h)
    pos = jnp.arange(w * h, dtype=jnp.int32)
    x, y = layout.xy_from_position(pos, w, h)
    assert (np.asarray(x) == np.arange(w * h) % w).all()
    assert (np.asarray(y) == np.arange(w * h) // w).all()


def test_block_is_one_tile():
    # first 4096 positions = the top-left 64x64 block
    w, h = 256, 128
    x, y = layout.xy_from_position(jnp.arange(4096, dtype=jnp.int32), w, h)
    assert int(jnp.max(x)) == 63 and int(jnp.max(y)) == 63


def test_to_image_from_image():
    w, h = 128, 64
    n = w * h
    flat = jnp.asarray(np.random.rand(n, 3).astype(np.float32))
    img = layout.to_image(flat, w, h)
    assert img.shape == (h, w, 3)
    x, y = layout.xy_from_position(jnp.arange(n, dtype=jnp.int32), w, h)
    ref = np.zeros((h, w, 3), np.float32)
    ref[np.asarray(y), np.asarray(x)] = np.asarray(flat)
    assert np.array_equal(np.asarray(img), ref)
    assert np.array_equal(np.asarray(layout.from_image(img)), np.asarray(flat))


def test_pixel_centers_block_order():
    w, h = 128, 64
    u, v = rays.pixel_centers(w, h)
    x, y = layout.xy_from_position(jnp.arange(w * h, dtype=jnp.int32), w, h)
    assert np.allclose(np.asarray(u), (np.asarray(x) + 0.5) / w)
    assert np.allclose(np.asarray(v), (np.asarray(y) + 0.5) / h)


def test_64x64_is_row_major():
    # one block == row-major: keeps the committed 64x64 goldens valid
    w = h = 64
    pos = jnp.arange(w * h, dtype=jnp.int32)
    x, y = layout.xy_from_position(pos, w, h)
    assert (np.asarray(x) == np.arange(w * h) % w).all()
    assert (np.asarray(y) == np.arange(w * h) // w).all()
