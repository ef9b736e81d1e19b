"""Frustum packet traversal v2: scalar walk + SMEM leaf queue + vector leaf loop.

Design, driven by two measured Mosaic facts (see git history / ADR in this
docstring):
 * a vector->scalar sync (jnp.any / jnp.max of a tile) costs ~1.3 us -- one
   per traversal step makes the walk latency-bound (~97 ns/step without it);
 * lax.cond lowers to predication (both branches execute), so "conditional"
   leaf work or refreshes run every step anyway.

So v2 splits each packet's traversal into alternating phases with NO
per-step vector work or syncs:

 Phase A (scalar unit only): walk the skip-index BVH using a CONSERVATIVE
   interval-arithmetic frustum test (packet origin box x reciprocal
   direction interval vs node AABB, from an SMEM bounds table). Frustum-hit
   leaves are appended to an SMEM queue with a branchless masked store.
   Stops when the queue fills or the walk ends.
 Phase B (vector unit): fori_loop over the queued leaves -- one dynamic
   VMEM row fetch + LEAF_WIDTH exact Moller-Trumbore / sphere tests per
   leaf, masked per lane. No decisions feed back to the scalar walk.
 Between phases: ONE packet-wide t_max refresh (the only vector->scalar
   sync), which prunes the continuing walk by distance.

Conservative culling visits a superset of the exact per-lane union --
exactness is preserved by the per-lane leaf tests; ray sorting
(ops/sort.py) keeps packets tight. Packet frustum bounds cost 13 vector
reductions once per packet-instance. Instance transforms/bounds/roots are
baked python constants (recompile on instance motion; dynamic scenes use
the XLA tracer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilgpu_raytracing_tpu.models.scene import BLAS_SPHERE_SET, BLAS_TRI_MESH
from ilgpu_raytracing_tpu.ops.intersect import T_EPS, T_INF
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, HitRecord
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    LEAF_WIDTH,
    PallasScene,
    _inv,
    _is_identity,
    _leaf_sph_test,
    _leaf_tri_test,
    _transform,
    prepare,  # noqa: F401  (re-export: same packed scene feeds both kernels)
    supports_scene,  # noqa: F401
)

TILE_ROWS = 32
_LANES = 128
QUEUE_CAP = 192  # leaf refs buffered per phase-A segment


def _interval_axis(bmin, bmax, olo, ohi, ilo, ihi):
    """Conservative per-axis slab interval (scalar): every packet ray has
    near >= near_lo and far <= far_hi."""
    a0 = bmin - ohi
    a1 = bmin - olo
    b0 = bmax - ohi
    b1 = bmax - olo
    p1 = a0 * ilo
    p2 = a0 * ihi
    p3 = a1 * ilo
    p4 = a1 * ihi
    t1lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    t1hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    q1 = b0 * ilo
    q2 = b0 * ihi
    q3 = b1 * ilo
    q4 = b1 * ihi
    t2lo = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
    t2hi = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
    return jnp.minimum(t1lo, t2lo), jnp.maximum(t1hi, t2hi)


def _make_kernel(meta, tile_rows: int):
    def kernel(ifl_ref, bnd_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, prim_ref, inst_ref, bu_ref, bv_ref, queue_ref):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]
        live = t_limit > 0.0

        t_best = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        prim_best = jnp.full(shape, -1, jnp.int32)
        inst_best = jnp.full(shape, -1, jnp.int32)
        bu_best = jnp.zeros(shape, jnp.float32)
        bv_best = jnp.zeros(shape, jnp.float32)

        for kind, root, w2o, wbounds, inst_id in meta:
            if _is_identity(w2o):
                ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
            else:
                ox, oy, oz, dx, dy, dz = _transform(
                    w2o, wox, woy, woz, wdx, wdy, wdz
                )
            ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)

            def rmin(v):
                return jnp.min(jnp.where(live, v, jnp.inf))

            def rmax(v):
                return jnp.max(jnp.where(live, v, -jnp.inf))

            oxlo, oxhi = rmin(ox), rmax(ox)
            oylo, oyhi = rmin(oy), rmax(oy)
            ozlo, ozhi = rmin(oz), rmax(oz)
            ixlo, ixhi = rmin(ix), rmax(ix)
            iylo, iyhi = rmin(iy), rmax(iy)
            izlo, izhi = rmin(iz), rmax(iz)
            pk_tmax0 = rmax(jnp.where(live, t_best, 0.0))
            any_live = jnp.any(live)
            cur0 = jax.lax.select(any_live, jnp.int32(root), jnp.int32(-1))

            # ---------- phase A: scalar frustum walk, queue leaves ----------
            def walk_cond(c):
                return (c[0] >= 0) & (c[1] < QUEUE_CAP)

            def walk_body(c):
                cur, n_q, pk_tmax = c
                nx_, fx_ = _interval_axis(
                    bnd_ref[cur * 6], bnd_ref[cur * 6 + 3],
                    oxlo, oxhi, ixlo, ixhi,
                )
                ny_, fy_ = _interval_axis(
                    bnd_ref[cur * 6 + 1], bnd_ref[cur * 6 + 4],
                    oylo, oyhi, iylo, iyhi,
                )
                nz_, fz_ = _interval_axis(
                    bnd_ref[cur * 6 + 2], bnd_ref[cur * 6 + 5],
                    ozlo, ozhi, izlo, izhi,
                )
                entry = jnp.maximum(jnp.maximum(nx_, ny_), nz_)
                exit_ = jnp.minimum(jnp.minimum(fx_, fy_), fz_)
                f_hit = (exit_ >= jnp.maximum(entry, T_EPS)) & (entry <= pk_tmax)

                left = ifl_ref[cur * 4]
                first = ifl_ref[cur * 4 + 1]
                count = ifl_ref[cur * 4 + 2]
                skip = ifl_ref[cur * 4 + 3]
                is_leaf = count > 0

                # branchless queue append: misses write to the dummy slot
                take = f_hit & is_leaf
                slot = jax.lax.select(take, n_q, jnp.int32(QUEUE_CAP))
                queue_ref[slot] = first * 16 + count
                n_q = n_q + jax.lax.select(take, 1, 0)

                nxt = jax.lax.select(
                    f_hit, jax.lax.select(is_leaf, skip, left), skip
                )
                return nxt, n_q, pk_tmax

            # ---------- phase B: vector loop over queued leaves ----------
            def drain(n_q, t_b, p_b, i_b, bu_b, bv_b):
                def leaf_body(q, carry):
                    t_b, p_b, i_b, bu_b, bv_b = carry
                    packed = queue_ref[q]
                    first = packed // 16
                    count = packed % 16
                    if kind == BLAS_TRI_MESH:
                        leaf_row = tri_ref[pl.ds(first, 1), :]
                        t_n, p_n, bu_n, bv_n = _leaf_tri_test(
                            leaf_row, count, ox, oy, oz, dx, dy, dz,
                            t_b, p_b, bu_b, bv_b,
                        )
                    else:
                        leaf_row = sph_ref[pl.ds(first, 1), :]
                        t_n, p_n = _leaf_sph_test(
                            leaf_row, count, ox, oy, oz, dx, dy, dz, t_b, p_b
                        )
                        bu_n, bv_n = bu_b, bv_b
                    took = t_n < t_b
                    return (
                        t_n, p_n, jnp.where(took, inst_id, i_b), bu_n, bv_n,
                    )

                return lax.fori_loop(
                    0, n_q, leaf_body, (t_b, p_b, i_b, bu_b, bv_b)
                )

            # ---------- alternate A/B until the walk completes ----------
            def seg_cond(c):
                return c[0] >= 0

            def seg_body(c):
                cur, pk_tmax, t_b, p_b, i_b, bu_b, bv_b = c
                cur, n_q, pk_tmax = lax.while_loop(
                    walk_cond, walk_body, (cur, jnp.int32(0), pk_tmax)
                )
                t_b, p_b, i_b, bu_b, bv_b = drain(n_q, t_b, p_b, i_b, bu_b, bv_b)
                # the one sync per segment: refresh the packet t_max
                pk_tmax = rmax(jnp.where(live, t_b, 0.0))
                return cur, pk_tmax, t_b, p_b, i_b, bu_b, bv_b

            out = lax.while_loop(
                seg_cond, seg_body,
                (cur0, pk_tmax0, t_best, prim_best, inst_best, bu_best,
                 bv_best),
            )
            _, _, t_best, prim_best, inst_best, bu_best, bv_best = out

        t_ref[...] = t_best
        prim_ref[...] = prim_best
        inst_ref[...] = inst_best
        bu_ref[...] = bu_best
        bv_ref[...] = bv_best

    return kernel


def _bounds_flat(pscene: PallasScene):
    rows = np.asarray(pscene.nodes_rows)
    return jnp.asarray(np.ascontiguousarray(rows[:, 0:6]).reshape(-1))


@functools.partial(
    jax.jit, static_argnames=("meta", "interpret", "tile_rows")
)
def _run_trace(arrays, meta, o, d, t_max, interpret=False, tile_rows=TILE_ROWS):
    node_ifields, bounds_flat, tri_rows, sph_rows = arrays
    n = o.shape[0]
    tile = tile_rows * _LANES
    n_pad = -(-n // tile) * tile
    g = n_pad // tile

    def comp(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(g * tile_rows, _LANES)

    ox, oy, oz = (comp(o[:, k]) for k in range(3))
    dx, dy, dz = (comp(d[:, k]) for k in range(3))
    tm = comp(t_max)

    ray_spec = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, s1, s2: (i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_kernel(meta, tile_rows)
    shp = (g * tile_rows, _LANES)
    out_shape = [
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.float32),
    ]
    t, prim, inst, bu, bv = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=[full, full] + [ray_spec] * 7,
            out_specs=[ray_spec] * 5,
            scratch_shapes=[pltpu.SMEM((QUEUE_CAP + 1,), jnp.int32)],
        ),
        interpret=interpret,
    )(node_ifields, bounds_flat, tri_rows, sph_rows, ox, oy, oz, dx, dy, dz, tm)

    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(prim), flat(inst), flat(bu), flat(bv)


def trace_closest_frustum(
    pscene: PallasScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
) -> HitRecord:
    """Closest-hit trace via the two-phase frustum kernel (drop-in for
    trace_closest_pallas)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    arrays = (
        pscene.node_ifields,
        _bounds_flat(pscene),
        pscene.tri_rows,
        pscene.sph_rows,
    )
    t, prim, inst, bu, bv = _run_trace(
        arrays, pscene.meta, o, d, t_max, interpret, tile_rows
    )
    miss = prim < 0
    kind_by_inst = {
        m[4]: (KIND_TRI if m[0] == BLAS_TRI_MESH else KIND_SPHERE)
        for m in pscene.meta
    }
    max_inst = max(kind_by_inst) if kind_by_inst else 0
    table = np.zeros((max_inst + 1,), np.int32)
    for i, k in kind_by_inst.items():
        table[i] = k
    kind = jnp.where(
        miss, 0, jnp.take(jnp.asarray(table), jnp.maximum(inst, 0), mode="clip")
    )
    return HitRecord(
        t=jnp.where(miss, T_INF, t),
        kind=kind,
        prim=prim,
        inst=inst,
        bu=bu,
        bv=bv,
    )


def shadow_occlusion_frustum(
    pscene: PallasScene, o, d, t_max_world, active=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
):
    hit = trace_closest_frustum(
        pscene, o, d, active=active, t_max=t_max_world, interpret=interpret,
        tile_rows=tile_rows,
    )
    return hit.prim >= 0
