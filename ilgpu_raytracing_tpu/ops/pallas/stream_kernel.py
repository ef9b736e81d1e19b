"""HBM-streaming 8-wide packet traversal for large scenes (BASELINE config 5).

The VMEM-resident kernels (traverse_kernel.py, wide_kernel.py) cap at
~150-200k triangles because every leaf row must live in VMEM. This variant
lifts the cap to millions of triangles (reference analog: Sponza-scale OBJ
meshes, Scene.cs:654-674):

* triangle leaf rows stay HBM-resident (memory_space=ANY);
* leaves are COARSE -- up to ``rows_per_leaf`` consecutive 8-tri rows
  (default 16 rows = 128 tris) so one leaf visit is one 8 KB DMA burst;
* the drain loop double-buffers: while the packet tests leaf q, the DMA for
  leaf q+1 is already in flight (latency ~1-2 us vs ~30 us of VPU test work
  per 16-row leaf -- fully hidden);
* the 8-wide SMEM node tables shrink with the coarser leaves (~1M tris ->
  ~8k leaves -> ~2.3k wide nodes = ~0.6 MB SMEM), so the scalar walk is
  unchanged from wide_kernel v4 (FRONT-node frontier, octant-ordered
  children, packet early-exit).

Sphere leaf rows remain VMEM-resident (sphere sets are always small).
Partial trailing rows rely on zero-padding degeneracy: an all-zero triangle
slot has det == 0 and an all-zero sphere slot has r == 0, both rejected by
the leaf tests; rows beyond a leaf's n_rows are masked explicitly because
the scratch buffer holds stale bytes from the previous DMA.
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

from ilgpu_raytracing_tpu.models.scene import (
    BLAS_SPHERE_SET,
    BLAS_TRI_MESH,
    SceneData,
)
from ilgpu_raytracing_tpu.ops.intersect import T_EPS, T_INF
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, HitRecord
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    _LANES,
    LEAF_WIDTH,
    TRI_STRIDE,
    SPH_STRIDE,
    _inv,
    _is_identity,
    _leaf_sph_test,
    _leaf_tri_test,
    _transform,
)
from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import (
    _EMPTY,
    _stack_bound,
    MAX_FRONT,
    _child_slab,
    _instance_enter,
    _leaf_sph_anyhit,
    _leaf_tri_anyhit,
    _octant_perms,
    _packet_octant,
    WIDTH,
)

TILE_ROWS = 32
FRONT = 4
STACK_CAP = 256
QUEUE_CAP = 48  # coarse leaves: fewer queue slots needed per drain round
ROWS_PER_LEAF = 16  # 128 tris per leaf = one 8 KB DMA burst

# leaf encoding: 5 bits of row count (1..16), row index above
_ENC_BASE = 32


def _leaf_enc(first_row: int, n_rows: int) -> int:
    assert 1 <= n_rows <= ROWS_PER_LEAF
    return -(first_row * _ENC_BASE + n_rows) - 2


@struct.dataclass
class StreamScene:
    """8-wide node tables (SMEM) + HBM-resident triangle rows."""

    wide_bounds: jnp.ndarray  # (W*48,) f32 scalar-prefetch
    wide_child: jnp.ndarray  # (W*8,) i32
    wide_perm: jnp.ndarray  # (W*8,) i32 per-octant child order
    tri_rows: jnp.ndarray  # (Lt, 128) f32, HBM (memory_space=ANY) --
    # or VMEM when `resident` (small scenes with coarse leaves)
    sph_rows: jnp.ndarray  # (Ls, 128) f32, VMEM
    meta: tuple = struct.field(pytree_node=False, default=())
    resident: bool = struct.field(pytree_node=False, default=False)
    # static max rows of any leaf (drain unrolls exactly this many)
    rows_per_leaf: int = struct.field(pytree_node=False, default=ROWS_PER_LEAF)
    # per-scene worst-case stack occupancy (wide_kernel._stack_bound); SMEM
    # stack scratch is sized from this, so overflow is impossible
    stack_cap: int = struct.field(pytree_node=False, default=STACK_CAP)


def supports_scene(scene: SceneData, max_tris: int = 4_000_000) -> bool:
    return scene.tri_v0.shape[0] <= max_tris


def prepare_stream(scene: SceneData, resident: bool = False) -> StreamScene:
    """Repack a committed scene with coarse multi-row leaves.

    The scene should be built with ``blas_leaf_size`` up to
    ``ROWS_PER_LEAF * 8`` (128); smaller leaves work but waste DMA.
    ``resident=True`` keeps the triangle rows in VMEM and reads them
    directly in the drain (no DMA): the multi-row-leaf variant of the wide
    kernel, for scenes that fit VMEM but want coarser leaves (fewer wide
    nodes -> cheaper node phase)."""
    ifields = np.asarray(scene.blas_ifields).copy()
    bounds = np.concatenate(
        [np.asarray(scene.blas_bmin), np.asarray(scene.blas_bmax)], axis=1
    )
    nn = ifields.shape[0]

    tri_prim = np.asarray(scene.tri_prim_idx)
    sph_prim = np.asarray(scene.sphere_prim_idx)
    tri_v0 = np.asarray(scene.tri_v0)
    tri_e1 = np.asarray(scene.tri_e1)
    tri_e2 = np.asarray(scene.tri_e2)
    sph_c = np.asarray(scene.sph_center)
    sph_r = np.asarray(scene.sph_radius)

    inst_types = {}
    for i in np.asarray(scene.sph_instances).tolist():
        inst_types[i] = BLAS_SPHERE_SET
    for i in np.asarray(scene.tri_instances).tolist():
        inst_types[i] = BLAS_TRI_MESH
    roots = np.asarray(scene.inst_blas_root)

    # tri leaves are only REGISTERED during the walk (first/count/row
    # assignment); the actual packing happens once, vectorized, after the
    # walk. Per-leaf numpy packing touched ~200 MB of fresh pages at 1M
    # tris, which costs ~20 s on this host's page-fault throughput.
    tri_leaves: list[tuple[int, int, int]] = []  # (first, count, row_start)
    tri_row_count = [0]
    sph_rows: list[np.ndarray] = []

    def pack_tri_leaf(first: int, count: int) -> tuple[int, int]:
        first_row = tri_row_count[0]
        n_rows = -(-count // LEAF_WIDTH)
        assert n_rows <= ROWS_PER_LEAF, (
            f"leaf of {count} tris needs {n_rows} rows > {ROWS_PER_LEAF}; "
            f"build with blas_leaf_size <= {ROWS_PER_LEAF * LEAF_WIDTH}"
        )
        tri_leaves.append((first, count, first_row))
        tri_row_count[0] += n_rows
        return first_row, n_rows

    def pack_sph_leaf(first: int, count: int) -> int:
        assert count <= LEAF_WIDTH
        row = np.zeros((_LANES,), np.float32)
        for j in range(count):
            p = int(sph_prim[first + j])
            base = j * SPH_STRIDE
            row[base : base + 3] = sph_c[p]
            row[base + 3] = sph_r[p]
            row[base + 4] = np.float32(p)
        sph_rows.append(row)
        return len(sph_rows) - 1

    # binary subtree -> leaf row assignment, then 8-wide collapse
    def is_leaf(b: int) -> bool:
        return ifields[b, 2] > 0

    leaf_rows: dict[int, tuple[int, int]] = {}  # binary node -> (row, nrows)
    max_rows = 1
    for inst_id, kind in sorted(inst_types.items()):
        root = int(roots[inst_id])
        stack = [root]
        while stack:
            cur = stack.pop()
            if cur < 0 or cur >= nn or cur in leaf_rows:
                continue
            left, first, count, _skip = ifields[cur]
            if count > 0:
                if kind == BLAS_TRI_MESH:
                    leaf_rows[cur] = pack_tri_leaf(int(first), int(count))
                    max_rows = max(max_rows, leaf_rows[cur][1])
                else:
                    leaf_rows[cur] = (pack_sph_leaf(int(first), int(count)), 1)
            else:
                stack.append(int(left))
                stack.append(cur + 1)

    wide_bounds: list[np.ndarray] = []
    wide_child: list[np.ndarray] = []

    def collapse(b_root: int) -> int:
        entries = [b_root]
        while len(entries) < WIDTH:
            idx = next((i for i, e in enumerate(entries) if not is_leaf(e)),
                       None)
            if idx is None:
                break
            b = entries.pop(idx)
            left = int(ifields[b, 0])
            entries.insert(idx, b + 1)
            entries.insert(idx, left)
        wid = len(wide_child)
        wb = np.zeros((WIDTH, 6), np.float32)
        wc = np.full((WIDTH,), _EMPTY, np.int32)
        wide_bounds.append(wb)
        wide_child.append(wc)
        for c, b in enumerate(entries):
            wb[c] = bounds[b]
            if is_leaf(b):
                row, nrows = leaf_rows[b]
                wc[c] = _leaf_enc(row, nrows)
            else:
                wc[c] = collapse(b)
        return wid

    meta = []
    for inst_id, kind in sorted(inst_types.items()):
        root = int(roots[inst_id])
        if is_leaf(root):
            wid = len(wide_child)
            wb = np.zeros((WIDTH, 6), np.float32)
            wc = np.full((WIDTH,), _EMPTY, np.int32)
            wb[0] = bounds[root]
            row, nrows = leaf_rows[root]
            wc[0] = _leaf_enc(row, nrows)
            wide_bounds.append(wb)
            wide_child.append(wc)
        else:
            wid = collapse(root)
        w2o = tuple(np.asarray(scene.inst_w2o[inst_id]).reshape(-1).tolist())
        wbnd = tuple(
            np.asarray(scene.inst_bmin[inst_id]).tolist()
            + np.asarray(scene.inst_bmax[inst_id]).tolist()
        )
        meta.append((int(kind), wid, w2o, wbnd, int(inst_id)))

    wb_all = np.stack(wide_bounds)
    wc_all = np.stack(wide_child)
    perms = np.stack(
        [_octant_perms(wb_all[i], wc_all[i]) for i in range(len(wc_all))]
    )
    smem_bytes = wb_all.size * 4 + wc_all.size * 4 + perms.size * 4
    assert smem_bytes < 900_000, (
        f"wide node tables need {smem_bytes} B SMEM; raise blas_leaf_size"
    )
    cap = _stack_bound(wc_all, [m[1] for m in meta]) + WIDTH
    assert cap <= 16384, (
        f"wide BVH needs a {cap}-entry traversal stack (pathologically "
        f"deep/unbalanced tree); rebuild with a different BVH method"
    )

    # one vectorized pack of every tri leaf: leaf tris occupy contiguous
    # flat slots [row_start*8, row_start*8+count) of a (rows*8, stride)
    # view, so a single repeat/cumsum scatter fills the whole table.
    # Padded to ROWS_PER_LEAF extra rows so a fixed-size DMA can never run
    # off the end.
    total_rows = max(1, tri_row_count[0])
    tri = np.zeros((total_rows + ROWS_PER_LEAF, _LANES), np.float32)
    if tri_leaves:
        firsts = np.asarray([l[0] for l in tri_leaves], np.int64)
        counts = np.asarray([l[1] for l in tri_leaves], np.int64)
        starts = np.asarray([l[2] for l in tri_leaves], np.int64)
        tot = int(counts.sum())
        ends = np.cumsum(counts)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            ends - counts, counts
        )
        src = np.repeat(firsts, counts) + within
        dst = np.repeat(starts * LEAF_WIDTH, counts) + within
        pidx = tri_prim[src]
        # NB a reshape of the non-contiguous tri[:, :96] slice would COPY;
        # scatter into a dense scratch, then one strided assign into tri
        flat = np.zeros((total_rows * LEAF_WIDTH, TRI_STRIDE), np.float32)
        flat[dst, 0:3] = tri_v0[pidx]
        flat[dst, 3:6] = tri_e1[pidx]
        flat[dst, 6:9] = tri_e2[pidx]
        flat[dst, 9] = pidx.astype(np.float32)
        tri[: total_rows, : LEAF_WIDTH * TRI_STRIDE] = flat.reshape(
            total_rows, LEAF_WIDTH * TRI_STRIDE
        )

    def rows_or_dummy(rows):
        return np.stack(rows) if rows else np.zeros((1, _LANES), np.float32)

    return StreamScene(
        wide_bounds=jnp.asarray(wb_all.reshape(-1)),
        wide_child=jnp.asarray(wc_all.reshape(-1)),
        wide_perm=jnp.asarray(perms.reshape(-1).astype(np.int32)),
        tri_rows=jnp.asarray(tri),
        sph_rows=jnp.asarray(rows_or_dummy(sph_rows)),
        meta=tuple(meta),
        resident=resident,
        rows_per_leaf=max_rows,
        stack_cap=max(int(cap), 64),
    )


def _walk_segment(wc_ref, wb_ref, wp_ref, stack_ref, queue_ref, octant,
                  front, sp, t_b, ox, oy, oz, ix, iy, iz, open_mask,
                  stack_cap=STACK_CAP):
    """One frontier round: pop up to `front` wide nodes, push/queue children
    near-first. Shared by closest and shadow kernels."""

    def walk_cond(w):
        return (w[0] > 0) & (w[1] < QUEUE_CAP)

    def walk_body(w):
        sp, n_q = w
        popped = []
        for _ in range(front):
            has = sp > 0
            sp = sp - jax.lax.select(has, 1, 0)
            wid = stack_ref[jax.lax.select(has, sp, stack_cap)]
            wid = jax.lax.select(has, wid, jnp.int32(0))
            popped.append((has, wid))
        for has, wid in reversed(popped):
            base_b = wid * 48
            base_c = wid * 8
            perm = wp_ref[base_c + octant]
            for rank in range(WIDTH - 1, -1, -1):
                c8 = (perm >> (rank * 4)) & 7
                child = wc_ref[base_c + c8]
                mask = _child_slab(
                    wb_ref, base_b + c8 * 6, ox, oy, oz, ix, iy, iz, t_b
                )
                if open_mask is not None:
                    mask = mask & open_mask
                hit = jnp.any(mask) & (child != _EMPTY) & has
                is_inner = child >= 0
                do_push = hit & is_inner
                slot = jax.lax.select(do_push, sp, jnp.int32(stack_cap))
                stack_ref[slot] = child
                sp = sp + jax.lax.select(do_push, 1, 0)
                do_q = hit & (~is_inner)
                qslot = jax.lax.select(
                    do_q, n_q, jnp.int32(QUEUE_CAP + WIDTH * front)
                )
                queue_ref[qslot] = -child - 2
                n_q = n_q + jax.lax.select(do_q, 1, 0)
        return sp, n_q

    return lax.while_loop(walk_cond, walk_body, (sp, jnp.int32(0)))


def _start_dma(tri_hbm, buf_ref, sem, queue_ref, q, n_q, slot, rows):
    """Kick the DMA for queue entry q into double-buffer `slot` (masked)."""

    @pl.when(q < n_q)
    def _():
        packed = queue_ref[q]
        first = packed // _ENC_BASE
        pltpu.make_async_copy(
            tri_hbm.at[pl.ds(first, rows), :],
            buf_ref.at[slot, pl.ds(0, rows)],
            sem.at[slot],
        ).start()


def _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot, rows):
    packed = queue_ref[q]
    first = packed // _ENC_BASE
    pltpu.make_async_copy(
        tri_hbm.at[pl.ds(first, rows), :],
        buf_ref.at[slot, pl.ds(0, rows)],
        sem.at[slot],
    ).wait()


def _make_closest_kernel(meta, tile_rows: int, front: int,
                         resident: bool = False,
                         rows_per_leaf: int = ROWS_PER_LEAF,
                         stack_cap: int = STACK_CAP):
    def kernel(wc_ref, wb_ref, wp_ref, tri_hbm, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, prim_ref, inst_ref, bu_ref, bv_ref,
               stack_ref, queue_ref, buf_ref, sem):
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
            # inst id + kind as one constant; caller decodes with shifts
            inst_enc = inst_id * 4 + (
                KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
            )
            if _is_identity(w2o):
                ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
            else:
                ox, oy, oz, dx, dy, dz = _transform(
                    w2o, wox, woy, woz, wdx, wdy, wdz
                )
            ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)
            wix, wiy, wiz = _inv(wdx), _inv(wdy), _inv(wdz)
            enter = _instance_enter(
                wbounds, wox, woy, woz, wix, wiy, wiz, t_best
            )
            octant = _packet_octant(dx, dy, dz)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def drain_tri(n_q, t_b, p_b, i_b, bu_b, bv_b):
                if not resident:
                    _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                               jnp.int32(0), n_q, jnp.int32(0),
                               rows_per_leaf)

                def leaf_body(q, carry):
                    t_b, p_b, i_b, bu_b, bv_b = carry
                    first = queue_ref[q] // _ENC_BASE
                    slot = q % 2
                    if not resident:
                        _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot,
                                  rows_per_leaf)
                        _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                                   q + 1, n_q, (q + 1) % 2,
                                   rows_per_leaf)
                    n_rows = queue_ref[q] % _ENC_BASE
                    for r in range(rows_per_leaf):
                        if resident:
                            leaf_row = tri_hbm[pl.ds(first + r, 1), :]
                        else:
                            leaf_row = buf_ref[slot, pl.ds(r, 1), :]
                        cnt = jax.lax.select(
                            r < n_rows, jnp.int32(LEAF_WIDTH), jnp.int32(0)
                        )
                        t_n, p_n, bu_n, bv_n = _leaf_tri_test(
                            leaf_row, cnt, ox, oy, oz, dx, dy, dz,
                            t_b, p_b, bu_b, bv_b,
                        )
                        took = t_n < t_b
                        i_b = jnp.where(took, inst_enc, i_b)
                        t_b, p_b, bu_b, bv_b = t_n, p_n, bu_n, bv_n
                    return t_b, p_b, i_b, bu_b, bv_b

                return lax.fori_loop(
                    0, n_q, leaf_body, (t_b, p_b, i_b, bu_b, bv_b)
                )

            def drain_sph(n_q, t_b, p_b, i_b, bu_b, bv_b):
                def leaf_body(q, carry):
                    t_b, p_b, i_b, bu_b, bv_b = carry
                    first = queue_ref[q] // _ENC_BASE
                    leaf_row = sph_ref[pl.ds(first, 1), :]
                    t_n, p_n = _leaf_sph_test(
                        leaf_row, LEAF_WIDTH, ox, oy, oz, dx, dy, dz, t_b, p_b
                    )
                    took = t_n < t_b
                    return (
                        t_n, p_n, jnp.where(took, inst_enc, i_b), bu_b, bv_b
                    )

                return lax.fori_loop(
                    0, n_q, leaf_body, (t_b, p_b, i_b, bu_b, bv_b)
                )

            def seg_cond(c):
                return c[0] > 0

            def seg_body(c):
                sp, t_b, p_b, i_b, bu_b, bv_b = c
                sp, n_q = _walk_segment(
                    wc_ref, wb_ref, wp_ref, stack_ref, queue_ref, octant,
                    front, sp, t_b, ox, oy, oz, ix, iy, iz, None,
                    stack_cap,
                )
                if kind == BLAS_TRI_MESH:
                    t_b, p_b, i_b, bu_b, bv_b = drain_tri(
                        n_q, t_b, p_b, i_b, bu_b, bv_b
                    )
                else:
                    t_b, p_b, i_b, bu_b, bv_b = drain_sph(
                        n_q, t_b, p_b, i_b, bu_b, bv_b
                    )
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


def _make_shadow_kernel(meta, tile_rows: int, front: int,
                        resident: bool = False,
                        rows_per_leaf: int = ROWS_PER_LEAF,
                        stack_cap: int = STACK_CAP):
    def kernel(wc_ref, wb_ref, wp_ref, tri_hbm, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               occ_ref, stack_ref, queue_ref, buf_ref, sem):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]
        active0 = t_limit > 0.0
        occ = jnp.zeros(shape, jnp.float32)

        for kind, wide_root, w2o, wbounds, inst_id in meta:
            if _is_identity(w2o):
                ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
            else:
                ox, oy, oz, dx, dy, dz = _transform(
                    w2o, wox, woy, woz, wdx, wdy, wdz
                )
            ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)
            wix, wiy, wiz = _inv(wdx), _inv(wdy), _inv(wdz)
            enter = (
                _instance_enter(wbounds, wox, woy, woz, wix, wiy, wiz, t_limit)
                & active0
                & (occ < 0.5)
            )
            octant = _packet_octant(dx, dy, dz)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def drain_tri(n_q, occ):
                if not resident:
                    _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                               jnp.int32(0), n_q, jnp.int32(0),
                               rows_per_leaf)

                def leaf_body(q, occ):
                    first = queue_ref[q] // _ENC_BASE
                    slot = q % 2
                    if not resident:
                        _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot,
                                  rows_per_leaf)
                        _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                                   q + 1, n_q, (q + 1) % 2,
                                   rows_per_leaf)
                    n_rows = queue_ref[q] % _ENC_BASE
                    for r in range(rows_per_leaf):
                        if resident:
                            leaf_row = tri_hbm[pl.ds(first + r, 1), :]
                        else:
                            leaf_row = buf_ref[slot, pl.ds(r, 1), :]
                        cnt = jax.lax.select(
                            r < n_rows, jnp.int32(LEAF_WIDTH), jnp.int32(0)
                        )
                        occ = _leaf_tri_anyhit(
                            leaf_row, cnt, ox, oy, oz, dx, dy, dz,
                            t_limit, occ, active0,
                        )
                    return occ

                return lax.fori_loop(0, n_q, leaf_body, occ)

            def drain_sph(n_q, occ):
                def leaf_body(q, occ):
                    first = queue_ref[q] // _ENC_BASE
                    leaf_row = sph_ref[pl.ds(first, 1), :]
                    return _leaf_sph_anyhit(
                        leaf_row, LEAF_WIDTH, ox, oy, oz, dx, dy, dz,
                        t_limit, occ, active0,
                    )

                return lax.fori_loop(0, n_q, leaf_body, occ)

            def seg_cond(c):
                return c[0] > 0

            def seg_body(c):
                sp, occ = c
                open_mask = active0 & (occ < 0.5)
                sp, n_q = _walk_segment(
                    wc_ref, wb_ref, wp_ref, stack_ref, queue_ref, octant,
                    front, sp, T_INF, ox, oy, oz, ix, iy, iz, open_mask,
                    stack_cap,
                )
                if kind == BLAS_TRI_MESH:
                    occ = drain_tri(n_q, occ)
                else:
                    occ = drain_sph(n_q, occ)
                any_open = jnp.any(active0 & (occ < 0.5))
                sp = jax.lax.select(any_open, sp, jnp.int32(0))
                return sp, occ

            sp0, occ = lax.while_loop(seg_cond, seg_body, (sp0, occ))

        occ_ref[...] = (occ > 0.5).astype(jnp.int32)

    return kernel


def _pad_tiles(x, tile_rows, n):
    tile = tile_rows * _LANES
    n_pad = -(-n // tile) * tile
    g = n_pad // tile
    return jnp.pad(x, (0, n_pad - n)).reshape(g * tile_rows, _LANES), g


def _common_specs(tile_rows, resident: bool, front: int = FRONT,
                  rows_per_leaf: int = ROWS_PER_LEAF,
                  stack_cap: int = STACK_CAP):
    """Scratch sized from the CALLER'S front/rows_per_leaf/stack_cap (the
    kernels index with exactly these values; module constants would
    under-allocate for larger overrides)."""
    ray_spec = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, s1, s2, s3: (i, 0),
        memory_space=pltpu.VMEM,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = vmem if resident else pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.SMEM((stack_cap + 1,), jnp.int32),
        pltpu.SMEM((QUEUE_CAP + WIDTH * front + 1,), jnp.int32),
        pltpu.VMEM((2, rows_per_leaf, _LANES), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return ray_spec, tri_spec, vmem, scratch


@functools.partial(
    jax.jit,
    static_argnames=("meta", "interpret", "tile_rows", "front", "resident",
                     "rows_per_leaf", "stack_cap"),
)
def _run_trace(arrays, meta, o, d, t_max, interpret=False,
               tile_rows=TILE_ROWS, front=FRONT, resident=False,
               rows_per_leaf=ROWS_PER_LEAF, stack_cap=STACK_CAP):
    wide_child, wide_bounds, wide_perm, tri_rows, sph_rows = arrays
    n = o.shape[0]
    ox, g = _pad_tiles(o[:, 0], tile_rows, n)
    oy, _ = _pad_tiles(o[:, 1], tile_rows, n)
    oz, _ = _pad_tiles(o[:, 2], tile_rows, n)
    dx, _ = _pad_tiles(d[:, 0], tile_rows, n)
    dy, _ = _pad_tiles(d[:, 1], tile_rows, n)
    dz, _ = _pad_tiles(d[:, 2], tile_rows, n)
    tm, _ = _pad_tiles(t_max, tile_rows, n)

    ray_spec, hbm, vmem, scratch = _common_specs(
        tile_rows, resident, front, rows_per_leaf, stack_cap
    )
    kernel = _make_closest_kernel(meta, tile_rows, front, resident,
                                  rows_per_leaf, stack_cap)
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
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[hbm, vmem] + [ray_spec] * 7,
            out_specs=[ray_spec] * 5,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(wide_child, wide_bounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(prim), flat(inst), flat(bu), flat(bv)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "interpret", "tile_rows", "front", "resident",
                     "rows_per_leaf", "stack_cap"),
)
def _run_shadow(arrays, meta, o, d, t_max, interpret=False,
                tile_rows=TILE_ROWS, front=FRONT, resident=False,
                rows_per_leaf=ROWS_PER_LEAF, stack_cap=STACK_CAP):
    wide_child, wide_bounds, wide_perm, tri_rows, sph_rows = arrays
    n = o.shape[0]
    ox, g = _pad_tiles(o[:, 0], tile_rows, n)
    oy, _ = _pad_tiles(o[:, 1], tile_rows, n)
    oz, _ = _pad_tiles(o[:, 2], tile_rows, n)
    dx, _ = _pad_tiles(d[:, 0], tile_rows, n)
    dy, _ = _pad_tiles(d[:, 1], tile_rows, n)
    dz, _ = _pad_tiles(d[:, 2], tile_rows, n)
    tm, _ = _pad_tiles(t_max, tile_rows, n)

    ray_spec, hbm, vmem, scratch = _common_specs(
        tile_rows, resident, front, rows_per_leaf, stack_cap
    )
    kernel = _make_shadow_kernel(meta, tile_rows, front, resident,
                                 rows_per_leaf, stack_cap)
    shp = (g * tile_rows, _LANES)
    occ = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shp, jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[hbm, vmem] + [ray_spec] * 7,
            out_specs=ray_spec,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(wide_child, wide_bounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    return occ.reshape(-1)[:n] != 0


def _arrays(s: StreamScene):
    return (s.wide_child, s.wide_bounds, s.wide_perm, s.tri_rows, s.sph_rows)


def trace_closest_stream(
    sscene: StreamScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
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
    assert front <= MAX_FRONT, f"front={front} exceeds MAX_FRONT={MAX_FRONT}"
    t, prim, inst, bu, bv = _run_trace(
        _arrays(sscene), sscene.meta, o, d, t_max, interpret, tile_rows,
        front, sscene.resident, sscene.rows_per_leaf, sscene.stack_cap,
    )
    miss = prim < 0
    kind = jnp.where(miss, 0, inst & 3)
    return HitRecord(
        t=jnp.where(miss, T_INF, t),
        kind=kind, prim=prim, inst=jnp.where(miss, -1, inst >> 2),
        bu=bu, bv=bv,
    )


def shadow_occlusion_stream(
    sscene: StreamScene, o, d, t_max_world, active=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max_world, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    assert front <= MAX_FRONT, f"front={front} exceeds MAX_FRONT={MAX_FRONT}"
    return _run_shadow(
        _arrays(sscene), sscene.meta, o, d, t_max, interpret, tile_rows,
        front, sscene.resident, sscene.rows_per_leaf, sscene.stack_cap,
    )
