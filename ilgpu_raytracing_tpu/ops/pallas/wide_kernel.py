"""8-wide BVH packet traversal (v3).

The binary packet kernel (traverse_kernel.py) pays one ~1.3 us
vector->scalar sync per binary node; measured, 8 independent reductions cost
about the same as one (they pipeline). So v3 collapses the binary skip-index
tree into 8-wide nodes: each step tests all 8 children's AABBs against the
packet (vector), takes 8 pipelined `any` reductions, pushes hit inner
children on an SMEM stack and queues hit leaf children; leaf queues drain in
segments through the exact vectorized leaf tests. Per-lane t_best feeds the
slab masks directly, so distance pruning is exact (same semantics as v1).

Node bounds/children live in SMEM scalar tables (48 f32 + 8 i32 per wide
node, ~224 B/node, ~1 MB SMEM budget => ~4k wide nodes ~ 200k+ triangles at
leaf 8). Reuses the packed leaf rows and instance baking of PallasScene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilgpu_raytracing_tpu.models.scene import BLAS_SPHERE_SET, BLAS_TRI_MESH
from ilgpu_raytracing_tpu.ops.intersect import T_EPS, T_INF
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, HitRecord
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    PallasScene,
    _inv,
    _is_identity,
    _leaf_sph_test,
    _leaf_tri_test,
    _transform,
    prepare,  # noqa: F401
    supports_scene,  # noqa: F401
)

TILE_ROWS = 32
_LANES = 128
WIDTH = 8
STACK_CAP = 256
QUEUE_CAP = 128

_EMPTY = -1  # child encodings: >=0 inner wide id; -1 empty; <=-2 leaf


def _leaf_enc(first: int, count: int) -> int:
    return -(first * 16 + count) - 2


@struct.dataclass
class WideScene:
    wide_bounds: jnp.ndarray  # (W*48,) f32 scalar-prefetch
    wide_child: jnp.ndarray  # (W*8,) i32 scalar-prefetch
    tri_rows: jnp.ndarray  # (Lt,128) f32 VMEM (shared with PallasScene)
    sph_rows: jnp.ndarray  # (Ls,128) f32
    meta: tuple = struct.field(pytree_node=False, default=())


def prepare_wide(pscene: PallasScene) -> WideScene:
    """Collapse each instance's binary skip-index subtree to 8-wide nodes."""
    ifl = np.asarray(pscene.node_ifields).reshape(-1, 4)
    rows = np.asarray(pscene.nodes_rows)
    bounds = rows[:, 0:6]

    wide_bounds: list[np.ndarray] = []
    wide_child: list[np.ndarray] = []

    def is_leaf(b: int) -> bool:
        return ifl[b, 2] > 0

    def collapse(b_root: int) -> int:
        # gather up to WIDTH binary descendants (leaves stay, inners expand)
        entries = [b_root]
        while len(entries) < WIDTH:
            idx = next(
                (i for i, e in enumerate(entries) if not is_leaf(e)), None
            )
            if idx is None:
                break
            b = entries.pop(idx)
            left = int(ifl[b, 0])
            right = b + 1  # right subtree emitted after the node
            entries.insert(idx, right)
            entries.insert(idx, left)

        wid = len(wide_child)
        wb = np.zeros((WIDTH, 6), np.float32)
        wc = np.full((WIDTH,), _EMPTY, np.int32)
        wide_bounds.append(wb)
        wide_child.append(wc)
        for c, b in enumerate(entries):
            wb[c] = bounds[b]
            if is_leaf(b):
                wc[c] = _leaf_enc(int(ifl[b, 1]), int(ifl[b, 2]))
            else:
                wc[c] = collapse(b)
        return wid

    meta = []
    for kind, root, w2o, wbounds, inst_id in pscene.meta:
        if is_leaf(root):
            # degenerate: single-leaf instance -> wide node with one child
            wid = len(wide_child)
            wb = np.zeros((WIDTH, 6), np.float32)
            wc = np.full((WIDTH,), _EMPTY, np.int32)
            wb[0] = bounds[root]
            wc[0] = _leaf_enc(int(ifl[root, 1]), int(ifl[root, 2]))
            wide_bounds.append(wb)
            wide_child.append(wc)
        else:
            wid = collapse(root)
        meta.append((kind, wid, w2o, wbounds, inst_id))

    return WideScene(
        wide_bounds=jnp.asarray(np.stack(wide_bounds).reshape(-1)),
        wide_child=jnp.asarray(np.stack(wide_child).reshape(-1)),
        tri_rows=pscene.tri_rows,
        sph_rows=pscene.sph_rows,
        meta=tuple(meta),
    )


def _make_kernel(meta, tile_rows: int):
    def kernel(wc_ref, wb_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, prim_ref, inst_ref, bu_ref, bv_ref,
               stack_ref, queue_ref):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

        t_best = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        prim_best = jnp.full(shape, -1, jnp.int32)
        inst_best = jnp.full(shape, -1, jnp.int32)
        bu_best = jnp.zeros(shape, jnp.float32)
        bv_best = jnp.zeros(shape, jnp.float32)

        for kind, wide_root, w2o, wbounds, inst_id in meta:
            if _is_identity(w2o):
                ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
            else:
                ox, oy, oz, dx, dy, dz = _transform(
                    w2o, wox, woy, woz, wdx, wdy, wdz
                )
            ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)

            # instance world-AABB early out (world-space rays)
            wix, wiy, wiz = _inv(wdx), _inv(wdy), _inv(wdz)
            bx0, by0, bz0, bx1, by1, bz1 = (float(v) for v in wbounds)
            t1 = (bx0 - wox) * wix
            t2 = (bx1 - wox) * wix
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            t1 = (by0 - woy) * wiy
            t2 = (by1 - woy) * wiy
            lo = jnp.maximum(lo, jnp.minimum(t1, t2))
            hi = jnp.minimum(hi, jnp.maximum(t1, t2))
            t1 = (bz0 - woz) * wiz
            t2 = (bz1 - woz) * wiz
            lo = jnp.maximum(lo, jnp.minimum(t1, t2))
            hi = jnp.minimum(hi, jnp.maximum(t1, t2))
            enter = (hi >= jnp.maximum(lo, T_EPS)) & (lo <= t_best)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def drain(n_q, t_b, p_b, i_b, bu_b, bv_b):
                def leaf_body(q, carry):
                    t_b, p_b, i_b, bu_b, bv_b = carry
                    packed = queue_ref[q]  # leaf enc (already decoded sign)
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

            def seg_cond(c):
                return c[0] > 0

            def seg_body(c):
                sp, t_b, p_b, i_b, bu_b, bv_b = c

                def walk_cond(w):
                    return (w[0] > 0) & (w[1] < QUEUE_CAP)

                def walk_body(w):
                    sp, n_q, t_b = w
                    sp = sp - 1
                    wid = stack_ref[sp]
                    base_b = wid * 48
                    base_c = wid * 8
                    for c8 in range(WIDTH):
                        child = wc_ref[base_c + c8]
                        b = base_b + c8 * 6
                        x0 = wb_ref[b]
                        y0 = wb_ref[b + 1]
                        z0 = wb_ref[b + 2]
                        x1 = wb_ref[b + 3]
                        y1 = wb_ref[b + 4]
                        z1 = wb_ref[b + 5]
                        t1 = (x0 - ox) * ix
                        t2 = (x1 - ox) * ix
                        lo = jnp.minimum(t1, t2)
                        hi = jnp.maximum(t1, t2)
                        t1 = (y0 - oy) * iy
                        t2 = (y1 - oy) * iy
                        lo = jnp.maximum(lo, jnp.minimum(t1, t2))
                        hi = jnp.minimum(hi, jnp.maximum(t1, t2))
                        t1 = (z0 - oz) * iz
                        t2 = (z1 - oz) * iz
                        lo = jnp.maximum(lo, jnp.minimum(t1, t2))
                        hi = jnp.minimum(hi, jnp.maximum(t1, t2))
                        mask = (hi >= jnp.maximum(lo, T_EPS)) & (lo <= t_b)
                        hit = jnp.any(mask) & (child != _EMPTY)
                        is_inner = child >= 0
                        # push hit inner children (dummy slot when not)
                        do_push = hit & is_inner
                        slot = jax.lax.select(do_push, sp, jnp.int32(STACK_CAP))
                        stack_ref[slot] = child
                        sp = sp + jax.lax.select(do_push, 1, 0)
                        # queue hit leaf children
                        do_q = hit & (~is_inner)
                        # up to 8 queue appends can land after the
                        # cap-check; dummy slot sits past that overflow
                        qslot = jax.lax.select(
                            do_q, n_q, jnp.int32(QUEUE_CAP + 8)
                        )
                        queue_ref[qslot] = -child - 2  # decode leaf enc
                        n_q = n_q + jax.lax.select(do_q, 1, 0)
                    return sp, n_q, t_b

                sp, n_q, t_b = lax.while_loop(
                    walk_cond, walk_body, (sp, jnp.int32(0), t_b)
                )
                t_b, p_b, i_b, bu_b, bv_b = drain(n_q, t_b, p_b, i_b, bu_b, bv_b)
                return sp, t_b, p_b, i_b, bu_b, bv_b

            out = lax.while_loop(
                seg_cond, seg_body,
                (sp0, t_best, prim_best, inst_best, bu_best, bv_best),
            )
            _, t_best, prim_best, inst_best, bu_best, bv_best = out

        t_ref[...] = t_best
        prim_ref[...] = prim_best
        inst_ref[...] = inst_best
        bu_ref[...] = bu_best
        bv_ref[...] = bv_best

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "tile_rows"))
def _run_trace(arrays, meta, o, d, t_max, interpret=False, tile_rows=TILE_ROWS):
    wide_child, wide_bounds, tri_rows, sph_rows = arrays
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
            scratch_shapes=[
                pltpu.SMEM((STACK_CAP + 1,), jnp.int32),
                pltpu.SMEM((QUEUE_CAP + 9,), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(wide_child, wide_bounds, tri_rows, sph_rows, ox, oy, oz, dx, dy, dz, tm)

    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(prim), flat(inst), flat(bu), flat(bv)


def trace_closest_wide(
    wscene: WideScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
) -> HitRecord:
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
        wscene.wide_child, wscene.wide_bounds, wscene.tri_rows, wscene.sph_rows
    )
    t, prim, inst, bu, bv = _run_trace(
        arrays, wscene.meta, o, d, t_max, interpret, tile_rows
    )
    miss = prim < 0
    kind_by_inst = {
        m[4]: (KIND_TRI if m[0] == BLAS_TRI_MESH else KIND_SPHERE)
        for m in wscene.meta
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


def shadow_occlusion_wide(
    wscene: WideScene, o, d, t_max_world, active=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
):
    hit = trace_closest_wide(
        wscene, o, d, active=active, t_max=t_max_world, interpret=interpret,
        tile_rows=tile_rows,
    )
    return hit.prim >= 0
