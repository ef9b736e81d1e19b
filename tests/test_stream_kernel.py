"""HBM-streaming traversal kernel (large-scene path, BASELINE config 5).

Oracle tests run the stream kernel (pallas interpret on CPU) against the
XLA while-loop tracer on jittered rays (pixel-center rays of a symmetric
cornell camera graze triangle edges exactly, where f32 bu/bv sign is a
coin flip between any two correct tracers)."""

import numpy as np
import jax.numpy as jnp

from ilgpu_raytracing_tpu.models.cornell import build_cornell_scene, cornell_camera
from ilgpu_raytracing_tpu.models.terrain import build_terrain_scene, terrain_camera
from ilgpu_raytracing_tpu.ops import rays as rays_mod, traverse
from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as sk
import pytest

pytestmark = pytest.mark.slow  # large-scene streaming kernel builds


def _jittered_rays(cam, w, h, seed=3):
    rng = np.random.default_rng(seed)
    u = (np.arange(w * h) % w + rng.random(w * h).astype(np.float32)) / w
    v = (np.arange(w * h) // w + rng.random(w * h).astype(np.float32)) / h
    return rays_mod.generate_rays(
        cam, jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)
    )


def test_stream_closest_and_shadow_match_oracle():
    _, scene = build_cornell_scene(
        tess=6, sphere_tess=(10, 14), blas_leaf_size=64, bvh_method="sah"
    )
    w, h = 128, 64
    o, d = _jittered_rays(cornell_camera(w, h), w, h)
    ss = sk.prepare_stream(scene)
    hit = sk.trace_closest_stream(ss, o, d)
    ref = traverse.trace_closest(scene, o, d)
    t1, t2 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.abs(t1 - t2) > 1e-3).sum() == 0
    same_prim = np.asarray(hit.prim) == np.asarray(ref.prim)
    assert same_prim.mean() > 0.995  # shared-edge t-ties may pick either tri

    sun = np.asarray([0.35, 0.8, 0.49], np.float32)
    sun /= np.linalg.norm(sun)
    surf = traverse.shade_hits(scene, ref, o, d)
    so = surf.pos + surf.normal * 1e-3
    sd = jnp.broadcast_to(jnp.asarray(sun), so.shape)
    occ1 = np.asarray(
        sk.shadow_occlusion_stream(ss, so, sd, 1e29, active=ref.hit)
    )
    occ2 = np.asarray(
        traverse.shadow_occlusion(scene, so, sd, 1e29, active=ref.hit)
    )
    assert ((occ1 != occ2) & np.asarray(ref.hit)).sum() == 0


def test_stream_multirow_leaves_cover_all_tris():
    """Every triangle lands in exactly one packed row slot."""
    _, scene = build_cornell_scene(
        tess=6, sphere_tess=(10, 14), blas_leaf_size=64, bvh_method="sah"
    )
    ss = sk.prepare_stream(scene)
    rows = np.asarray(ss.tri_rows)
    ids = []
    for row in rows:
        for j in range(sk.LEAF_WIDTH):
            base = j * sk.TRI_STRIDE
            e = row[base + 3 : base + 9]
            if np.any(e != 0.0):
                ids.append(int(row[base + 9]))
    n_tris = int(scene.tri_v0.shape[0])
    assert sorted(ids) == list(range(n_tris))


def test_terrain_scene_stream_render():
    """A (scaled-down) terrain mesh renders through the production
    integrator on the streaming kernel and matches the oracle."""
    _, scene = build_terrain_scene(grid_x=64, grid_z=32)  # default leaf=64
    assert scene.tri_v0.shape[0] == 64 * 32 * 2
    w, h = 96, 64
    cam = terrain_camera(w, h)
    o, d = _jittered_rays(cam, w, h, seed=11)
    ss = sk.prepare_stream(scene)
    hit = sk.trace_closest_stream(ss, o, d)
    ref = traverse.trace_closest(scene, o, d)
    assert (np.abs(np.asarray(hit.t) - np.asarray(ref.t)) > 1e-3).sum() == 0
    assert np.asarray(hit.hit).mean() > 0.5  # terrain fills the view


def test_quantized_bounds_cover_exact_bounds():
    """_quantize_bounds must round child boxes outward under the kernel's
    own f32 dequantization (lo + f32(q) * scale) for adversarial frames:
    tiny extents, huge coordinates, flat dims, negative ranges."""
    rs = np.random.RandomState(11)
    n = 512
    lo = np.float32(rs.uniform(-1e6, 1e6, (n, 8, 3)))
    ext = np.float32(10.0 ** rs.uniform(-6, 5, (n, 8, 3)))
    hi = lo + ext
    flat = rs.rand(n, 8, 3) < 0.1
    hi = np.where(flat, lo, hi).astype(np.float32)
    wb = np.concatenate([lo, hi], axis=2)
    wc = np.where(rs.rand(n, 8) < 0.2, sk._EMPTY, 1).astype(np.int32)
    wc[:, 0] = 1  # every node keeps at least one child
    wf, wq = sk._quantize_bounds(wb, wc)
    flo = wf[:, None, 0:3]
    fs = wf[:, None, 3:6]
    w = wq.view(np.uint32).reshape(n, 8, 2)
    q = np.stack(
        [w[:, :, 0] & 255, (w[:, :, 0] >> 8) & 255,
         (w[:, :, 0] >> 16) & 255, (w[:, :, 0] >> 24) & 255,
         w[:, :, 1] & 255, (w[:, :, 1] >> 8) & 255], axis=2,
    ).astype(np.float32)
    dlo = flo + q[:, :, 0:3] * fs
    dhi = flo + q[:, :, 3:6] * fs
    occ = np.broadcast_to((wc != sk._EMPTY)[:, :, None], dlo.shape)
    assert (dlo[occ] <= lo[occ]).all()
    assert (dhi[occ] >= hi[occ]).all()
    # boxes may only inflate by ~2 quantization steps
    step = np.broadcast_to(fs, dlo.shape)
    assert ((lo - dlo)[occ] <= 2.5 * step[occ] + 1e-30).all()
    assert ((dhi - hi)[occ] <= 2.5 * step[occ] + 1e-30).all()
