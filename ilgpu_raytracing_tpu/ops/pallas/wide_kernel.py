"""8-wide BVH packet traversal (v4).

The binary packet kernel (traverse_kernel.py) pays one ~1.3 us
vector->scalar sync round per binary node. v4 attacks that latency three
ways on top of v3's 8-wide collapse:

* FRONT-node frontier: each walk iteration pops up to FRONT wide nodes and
  tests all FRONT*8 children before any scalar decision depends on the
  results, so the vector->scalar round-trip is paid once per FRONT nodes
  (the independent `any` reductions pipeline; measured on v5e, 8 cost about
  the same as 1).
* Octant-ordered children: prepare_wide precomputes, per wide node, the
  near-to-far child permutation for each of the 8 ray-direction octants
  (packed 4 bits/child into one int32). The packet's octant comes from its
  first lane; inner children are pushed far-first (so near pops first) and
  leaf children drain near-first, which tightens per-lane t_best sooner and
  prunes later leaf tests. Ordering is a pure pruning heuristic -- per-lane
  masks keep exact semantics for incoherent packets.
* A dedicated shadow (any-hit) kernel: lanes latch `occluded` at the first
  accepting leaf, masks drop occluded lanes from all further node/leaf
  work, and the whole walk exits once every active lane is occluded
  (reference ShadowOcclusion, SceneDeviceViews.cs:88-121, which likewise
  returns on first hit).

Node bounds/children/perms live in SMEM scalar tables (48 f32 + 8 i32 +
8 i32 per wide node, ~256 B/node, ~1 MB SMEM budget => ~4k wide nodes ~
200k+ triangles at leaf 8). Reuses the packed leaf rows and instance baking
of PallasScene.
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
from ilgpu_raytracing_tpu.ops.intersect import (
    T_EPS,
    T_INF,
    intersect_triangle,
)
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, HitRecord
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    PallasScene,
    _inv,
    _is_identity,
    _transform,
    prepare,  # noqa: F401
    supports_scene,  # noqa: F401
)

TILE_ROWS = 32
_LANES = 128
WIDTH = 8
FRONT = 4  # nodes popped per sync round
MAX_FRONT = 8  # stack bounds are simulated at this front; callers must not exceed it
STACK_CAP = 256  # fallback for scenes prepared before per-scene bounds
QUEUE_CAP = 128

_EMPTY = -1  # child encodings: >=0 inner wide id; -1 empty; <=-2 leaf


def _stack_bound(wc_all: np.ndarray, roots, front: int = MAX_FRONT) -> int:
    """Exact worst-case SMEM stack occupancy for the frontier walk.

    Simulates the kernel's pop-`front`/push-children loop assuming EVERY
    child slab test hits -- a superset of any real run's pushes at every
    round, so its max stack depth dominates. Each instance pass starts from
    its own root with an empty stack (the segment loop drains to zero
    before the next instance), so the bound is the per-root max. Larger
    `front` pops strictly more before re-pushing, so the MAX_FRONT bound
    covers every smaller front. O(total wide nodes)."""
    best = 1
    for root in roots:
        stack = [int(root)]
        max_sp = 1
        while stack:
            popped = [stack.pop() for _ in range(min(front, len(stack)))]
            for wid in reversed(popped):
                for c in wc_all[wid]:
                    if c >= 0:
                        stack.append(int(c))
            if len(stack) > max_sp:
                max_sp = len(stack)
        best = max(best, max_sp)
    return best


def _leaf_enc(first: int, count: int) -> int:
    return -(first * 16 + count) - 2


@struct.dataclass
class WideScene:
    wide_bounds: jnp.ndarray  # (W*48,) f32 scalar-prefetch
    wide_child: jnp.ndarray  # (W*8,) i32 scalar-prefetch
    wide_perm: jnp.ndarray  # (W*8,) i32: per-octant child order, 4b/child
    tri_rows: jnp.ndarray  # (Lt,128) f32 VMEM (shared with PallasScene)
    sph_rows: jnp.ndarray  # (Ls,128) f32
    # XLA-side (HBM) tables for the barycentric epilogue: per-prim triangle
    # (v0, e1, e2) rows and per-instance world->object affines. The kernel
    # returns only (t, prim|inst); bu/bv are recomputed per lane against the
    # winning triangle with ops/intersect.intersect_triangle.
    tri_v0e: jnp.ndarray = None  # (T, 9) f32
    inst_w2o: jnp.ndarray = None  # (I, 12) f32
    meta: tuple = struct.field(pytree_node=False, default=())
    # per-scene worst-case stack occupancy (see _stack_bound); the kernels
    # size their SMEM stack scratch from this, so overflow is impossible
    stack_cap: int = struct.field(pytree_node=False, default=STACK_CAP)
    # max primitives in any leaf row (leaf test loop trip count)
    leaf_width: int = struct.field(pytree_node=False, default=WIDTH)
    # optional jax.sharding.Mesh: when set, kernel dispatch runs under
    # shard_map over axis "px" -- each device walks its own ray shard with
    # the scene tables replicated (GSPMD does NOT partition pallas_call on
    # its own; this is the manual-partitioning path that puts the
    # production tracer on a multi-chip slice). Set via with_mesh().
    mesh: object = struct.field(pytree_node=False, default=None)
    # False => the decode epilogue skips the tri_v0e gather + MT redo and
    # returns bu = bv = 0 (valid whenever no tri material samples a diffuse
    # texture and the scene has no alpha cutouts; see
    # traverse_kernel._scene_needs_bary). Inherited from PallasScene.
    needs_bary: bool = struct.field(pytree_node=False, default=True)


def _octant_perms(wb: np.ndarray, wc: np.ndarray) -> np.ndarray:
    """Per-octant near-to-far child order for one wide node.

    Returns (8,) int32; each packs 8 child slots, 4 bits per visit rank."""
    cent = (wb[:, 0:3] + wb[:, 3:6]) * 0.5
    perms = np.zeros((8,), np.int32)
    for o in range(8):
        sign = np.array(
            [1.0 if o & 4 else -1.0,
             1.0 if o & 2 else -1.0,
             1.0 if o & 1 else -1.0],
            np.float32,
        )
        key = cent @ sign
        key = np.where(wc == _EMPTY, np.inf, key)  # empties visit last
        order = np.argsort(key, kind="stable")
        packed = 0
        for rank, child_slot in enumerate(order):
            packed |= int(child_slot) << (rank * 4)
        perms[o] = np.int32(np.uint32(packed).view(np.int32))
    return perms


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

    wb_all = np.stack(wide_bounds)
    wc_all = np.stack(wide_child)
    perms = np.stack(
        [_octant_perms(wb_all[i], wc_all[i]) for i in range(len(wc_all))]
    )
    # leaf encodings ride in the low _Q_MASK_SHIFT bits of queue entries
    # (subtile want mask above); the VMEM row cap (~200k tris) sits far
    # below this, so the assert only guards future capacity changes
    assert int(-(wc_all.min())) - 2 < (1 << _Q_MASK_SHIFT), (
        "leaf row index overflows the queue's 24-bit leaf encoding"
    )
    cap = _stack_bound(wc_all, [m[1] for m in meta]) + WIDTH
    assert cap <= 16384, (
        f"wide BVH needs a {cap}-entry traversal stack (pathologically "
        f"deep/unbalanced tree); rebuild with a different BVH method"
    )

    # per-prim (v0,e1,e2) table for the barycentric epilogue, reconstructed
    # from the packed leaf rows (each prim lives in exactly one leaf slot;
    # empty slots are all-zero and excluded). Vectorized: this host's
    # first-touch memory is slow, per-slot python loops are not an option.
    tri_rows_np = np.asarray(pscene.tri_rows)
    from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import TRI_STRIDE
    slot_base = np.arange(WIDTH) * TRI_STRIDE  # (8,)
    ids = tri_rows_np[:, slot_base + 9].astype(np.int64)  # (L,8)
    vals = tri_rows_np[:, slot_base[:, None] + np.arange(9)[None, :]]
    real = (ids != 0) | (np.abs(vals).sum(axis=-1) > 0.0)
    n_tbl = int(ids[real].max()) + 1 if real.any() else 1
    tri_v0e = np.zeros((n_tbl, 9), np.float32)
    tri_v0e[ids[real]] = vals[real]

    max_inst = max((m[4] for m in meta), default=0)
    inst_w2o = np.tile(
        np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32),
        (max_inst + 1, 1),
    )
    for kind, _wid, w2o, _wb, inst_id in meta:
        inst_w2o[inst_id] = np.asarray(w2o, np.float32)

    max_prim = max(
        n_tbl - 1,
        int(np.asarray(pscene.sph_rows)[:, [
            j * 16 + 4 for j in range(WIDTH)
        ]].max()),
    )
    assert max_prim < (1 << PP_PRIM_BITS), (
        f"prim id {max_prim} overflows the {PP_PRIM_BITS}-bit packed hit "
        f"record (raise PP_PRIM_BITS or shrink the scene)"
    )
    max_inst_enc = max_inst * 4 + 3
    assert max_inst_enc < (1 << (31 - PP_PRIM_BITS)), (
        f"instance encoding {max_inst_enc} overflows the packed hit record"
    )

    return WideScene(
        wide_bounds=jnp.asarray(wb_all.reshape(-1)),
        wide_child=jnp.asarray(wc_all.reshape(-1)),
        wide_perm=jnp.asarray(perms.reshape(-1).astype(np.int32)),
        tri_rows=pscene.tri_rows,
        sph_rows=pscene.sph_rows,
        tri_v0e=jnp.asarray(tri_v0e),
        inst_w2o=jnp.asarray(inst_w2o),
        meta=tuple(meta),
        stack_cap=max(int(cap), 64),
        leaf_width=pscene.leaf_width,
        needs_bary=pscene.needs_bary,
    )


def _instance_enter(wbounds, wox, woy, woz, wix, wiy, wiz, t_best):
    """World-space instance AABB early-out mask."""
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
    # clamp lo to T_EPS on BOTH tests: inactive lanes (t_best == 0) with a
    # stale origin inside the box then fail `lo <= t_best` instead of
    # inflating the packet's node-visit union
    lo = jnp.maximum(lo, T_EPS)
    return (hi >= lo) & (lo <= t_best)


def _child_slab(wb_ref, b, ox, oy, oz, ix, iy, iz, t_b):
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
    lo = jnp.maximum(lo, T_EPS)  # see _instance_enter: culls dead lanes
    return (hi >= lo) & (lo <= t_b)


def _packet_octant(dx, dy, dz):
    """Direction octant of the packet's first lane (ordering heuristic
    only -- correctness never depends on it)."""
    o = jnp.where(dx[0, 0] > 0.0, jnp.int32(4), jnp.int32(0))
    o = o + jnp.where(dy[0, 0] > 0.0, jnp.int32(2), jnp.int32(0))
    return o + jnp.where(dz[0, 0] > 0.0, jnp.int32(1), jnp.int32(0))


SUB_ROWS = 8  # one native (8,128) vreg per subtile
DRAIN_UNROLL = 4  # leaves decoded+loaded per drain iteration (loads pipeline)

_Q_MASK_SHIFT = 24  # leaf enc rides bits 0..23, subtile want mask above

# closest-hit record packing: prim id in the low bits, instance encoding
# (inst_id*4+kind) above. One i32 output ref carries what five (t, prim,
# inst, bu, bv) refs used to: the drain's per-(leaf,subtile) fixed cost is
# dominated by output-ref read/write roundtrips, not MT arithmetic
# (measured: subtile gating halved drain VPU work, closest time was flat).
# Barycentrics are recomputed OUTSIDE the kernel in an XLA epilogue -- a
# per-lane gather of the winning triangle is exactly the data-dependent
# access XLA does well and Pallas/TPU cannot.
PP_PRIM_BITS = 20
_PP_PRIM_MASK = (1 << PP_PRIM_BITS) - 1


def _leaf_tri_test_pp(leaf_row, count, ox, oy, oz, dx, dy, dz,
                      t_best, pp_best, inst_bits: int,
                      leaf_width: int = WIDTH):
    """MT test updating the packed (t, prim|inst) hit record.

    Same accept predicate and test order as traverse_kernel._leaf_tri_test
    (hit/t/prim results are bit-identical); only the bookkeeping differs:
    one packed i32 carries prim + instance encoding, and bu/bv are not
    tracked (the caller recomputes them in an XLA epilogue)."""
    from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
        TRI_STRIDE,
        _vcell,
    )

    rows = ox.shape[0]
    for j in range(leaf_width):
        base = j * TRI_STRIDE
        v0x, v0y, v0z = (_vcell(leaf_row, base + k, rows) for k in range(3))
        e1x, e1y, e1z = (_vcell(leaf_row, base + 3 + k, rows) for k in range(3))
        e2x, e2y, e2z = (_vcell(leaf_row, base + 6 + k, rows) for k in range(3))
        prim_bits = _vcell(leaf_row, base + 9, rows)

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= 1e-8
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        bu = (tvx * px + tvy * py + tvz * pz) * inv_det
        ok = ok & (bu >= 0.0) & (bu <= 1.0)
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        bv = (dx * qx + dy * qy + dz * qz) * inv_det
        ok = ok & (bv >= 0.0) & (bu + bv <= 1.0)
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok & (t > T_EPS) & (t < t_best)
        ok = ok & (j < count)
        pp = prim_bits.astype(jnp.int32) + inst_bits
        t_best = jnp.where(ok, t, t_best)
        pp_best = jnp.where(ok, pp, pp_best)
    return t_best, pp_best


def _leaf_sph_test_pp(leaf_row, count, ox, oy, oz, dx, dy, dz,
                      t_best, pp_best, inst_bits: int,
                      leaf_width: int = WIDTH):
    from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
        SPH_STRIDE,
        _vcell,
    )

    rows = ox.shape[0]
    for j in range(leaf_width):
        base = j * SPH_STRIDE
        cx, cy, cz = (_vcell(leaf_row, base + k, rows) for k in range(3))
        r = _vcell(leaf_row, base + 3, rows)
        prim_bits = _vcell(leaf_row, base + 4, rows)
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv2a = 1.0 / (2.0 * a)
        t0 = (-b - sq) * inv2a
        t1 = (-b + sq) * inv2a
        t = jnp.where(t0 >= T_EPS, t0, t1)
        ok = ok & (t >= T_EPS) & (t < t_best) & (r > 0.0)
        ok = ok & (j < count)
        pp = prim_bits.astype(jnp.int32) + inst_bits
        t_best = jnp.where(ok, t, t_best)
        pp_best = jnp.where(ok, pp, pp_best)
    return t_best, pp_best


def _make_closest_kernel(meta, tile_rows: int, front: int,
                         stack_cap: int = STACK_CAP,
                         leaf_width: int = WIDTH,
                         with_stats: bool = False,
                         drain_unroll: int | None = None):
    if drain_unroll is None:
        drain_unroll = DRAIN_UNROLL
    # subtile-gated leaf drain: the tile splits into (8,128) subtiles; each
    # queued leaf carries a per-subtile want mask (from the child slab test)
    # and the drain MT-tests ONLY wanting subtiles. On incoherent sorted
    # bounce packets most leaves are wanted by 1-2 of 4 subtiles, so this
    # cuts the dominant leaf-phase VPU cost toward the roofline's unions/2
    # band (BENCHLOG.md memo) while keeping the 4096-lane node-phase
    # amortization. Hit state lives in TWO output refs (t + packed
    # prim|inst; round-2's five-ref record made the drain ref-roundtrip
    # bound), so the drain pipelines DRAIN_UNROLL hoisted row loads like
    # the shadow kernel without spilling. Hit/t/prim/inst results are
    # bit-identical to the five-ref kernel (same test order, same accept
    # predicate); bu/bv move to the caller's XLA epilogue.
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(wc_ref, wb_ref, wp_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, pp_ref,
               *rest):
        if with_stats:
            stats_ref, stack_ref, queue_ref = rest
        else:
            stack_ref, queue_ref = rest
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

        t_ref[...] = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        pp_ref[...] = jnp.full(shape, -1, jnp.int32)

        # traversal counters (per packet): wide nodes popped, leaf rows
        # drained, vector->scalar sync rounds. Carried unconditionally
        # (scalar adds are free next to the slab tests); written only in
        # stats mode.
        nn_tot = jnp.int32(0)
        lv_tot = jnp.int32(0)
        rd_tot = jnp.int32(0)
        sm_tot = jnp.int32(0)  # total wanted subtiles over queued leaves

        for kind, wide_root, w2o, wbounds, inst_id in meta:
            # instance id and BLAS kind ride together in the hit record:
            # kernel-side the pair is one per-instance constant packed above
            # the prim bits, so the caller decodes kind with shifts instead
            # of a (N,) gather (measured 6.4 ms per trace at 901k lanes)
            inst_enc = inst_id * 4 + (
                KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
            )
            inst_bits = inst_enc << PP_PRIM_BITS
            if _is_identity(w2o):
                ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
            else:
                ox, oy, oz, dx, dy, dz = _transform(
                    w2o, wox, woy, woz, wdx, wdy, wdz
                )
            ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)
            wix, wiy, wiz = _inv(wdx), _inv(wdy), _inv(wdz)
            enter = _instance_enter(
                wbounds, wox, woy, woz, wix, wiy, wiz, t_ref[...]
            )
            octant = _packet_octant(dx, dy, dz)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def drain(n_q):
                # DRAIN_UNROLL leaves decoded + rows loaded up-front each
                # iteration so the dependent VMEM loads pipeline (the shadow
                # kernel's structure; with the two-ref packed record the
                # closest drain no longer spills doing it -- the round-2
                # five-ref version measured 25->40 ms on primary when
                # unrolled). enc >= 0 always: shift decode. Invalid tail
                # entries load sub=0 so every subtile gate skips them.
                def leaf_body(qq, carry):
                    q0 = qq * drain_unroll
                    loaded = []
                    for u in range(drain_unroll):
                        qi = q0 + u
                        valid = qi < n_q
                        packed = queue_ref[jax.lax.select(
                            valid, qi, jnp.int32(QUEUE_CAP + WIDTH * front)
                        )]
                        packed = jax.lax.select(valid, packed, jnp.int32(0))
                        sub = packed >> _Q_MASK_SHIFT
                        enc = packed & ((1 << _Q_MASK_SHIFT) - 1)
                        first = enc >> 4
                        count = enc & 15
                        if kind == BLAS_TRI_MESH:
                            leaf_row = tri_ref[pl.ds(first, 1), :]
                        else:
                            leaf_row = sph_ref[pl.ds(first, 1), :]
                        loaded.append((sub, count, leaf_row))
                    for sub, count, leaf_row in loaded:
                      for s in range(n_sub):
                        @pl.when(((sub >> s) & 1) != 0)
                        def _(s=s, count=count, leaf_row=leaf_row):
                            sl = slice(s * sub_rows, (s + 1) * sub_rows)
                            t_b = t_ref[sl, :]
                            pp_b = pp_ref[sl, :]
                            if kind == BLAS_TRI_MESH:
                                t_n, pp_n = _leaf_tri_test_pp(
                                    leaf_row, count,
                                    ox[sl], oy[sl], oz[sl],
                                    dx[sl], dy[sl], dz[sl],
                                    t_b, pp_b, inst_bits, leaf_width,
                                )
                            else:
                                t_n, pp_n = _leaf_sph_test_pp(
                                    leaf_row, count,
                                    ox[sl], oy[sl], oz[sl],
                                    dx[sl], dy[sl], dz[sl],
                                    t_b, pp_b, inst_bits, leaf_width,
                                )
                            t_ref[sl, :] = t_n
                            pp_ref[sl, :] = pp_n
                    return carry

                n_grp = (n_q + drain_unroll - 1) // drain_unroll
                return lax.fori_loop(0, n_grp, leaf_body, jnp.int32(0))

            def walk_segment(sp, t_b, nn, rd, sm):
                def walk_cond(w):
                    return (w[0] > 0) & (w[1] < QUEUE_CAP)

                def walk_body(w):
                    sp, n_q, nn, rd, sm = w
                    rd = rd + 1
                    # pop up to `front` nodes before touching any reduction
                    popped = []
                    for _ in range(front):
                        has = sp > 0
                        nn = nn + jax.lax.select(has, 1, 0)
                        sp = sp - jax.lax.select(has, 1, 0)
                        wid = stack_ref[jax.lax.select(has, sp, stack_cap)]
                        wid = jax.lax.select(has, wid, jnp.int32(0))
                        popped.append((has, wid))
                    # all child tests + anys issue back-to-back (pipelined).
                    # Iterate far-to-near (reverse perm rank, and reverse
                    # pop order across the frontier): the stack pops newest
                    # first, so pushing far-first leaves the NEAREST child
                    # on top for the next round -- per-lane t_best tightens
                    # sooner and `lo <= t_best` culls the far siblings.
                    for has, wid in reversed(popped):
                        base_b = wid * 48
                        base_c = wid * 8
                        perm = wp_ref[base_c + octant]
                        for rank in range(WIDTH - 1, -1, -1):
                            c8 = (perm >> (rank * 4)) & 7
                            child = wc_ref[base_c + c8]
                            mask = _child_slab(
                                wb_ref, base_b + c8 * 6,
                                ox, oy, oz, ix, iy, iz, t_b,
                            )
                            # per-subtile wants; the full-tile any is their
                            # OR (same reduction work, the anys pipeline)
                            wants = [
                                jnp.any(mask[s * sub_rows:(s + 1) * sub_rows, :])
                                for s in range(n_sub)
                            ]
                            any_w = wants[0]
                            for wnt in wants[1:]:
                                any_w = any_w | wnt
                            hit = any_w & (child != _EMPTY) & has
                            is_inner = child >= 0
                            do_push = hit & is_inner
                            slot = jax.lax.select(
                                do_push, sp, jnp.int32(stack_cap)
                            )
                            stack_ref[slot] = child
                            sp = sp + jax.lax.select(do_push, 1, 0)
                            # queue hit leaf children (near-first order)
                            # with their subtile want mask in the high bits
                            do_q = hit & (~is_inner)
                            qslot = jax.lax.select(
                                do_q, n_q, jnp.int32(QUEUE_CAP + WIDTH * front)
                            )
                            submask = jnp.int32(0)
                            for s, wnt in enumerate(wants):
                                submask = submask + jax.lax.select(
                                    wnt, jnp.int32(1 << s), jnp.int32(0)
                                )
                            queue_ref[qslot] = (
                                (-child - 2) + (submask << _Q_MASK_SHIFT)
                            )
                            n_q = n_q + jax.lax.select(do_q, 1, 0)
                            npop = jnp.int32(0)
                            for wnt in wants:
                                npop = npop + jax.lax.select(
                                    wnt, jnp.int32(1), jnp.int32(0)
                                )
                            sm = sm + jax.lax.select(do_q, npop, jnp.int32(0))
                    return sp, n_q, nn, rd, sm

                return lax.while_loop(
                    walk_cond, walk_body, (sp, jnp.int32(0), nn, rd, sm)
                )

            def seg_cond(c):
                return c[0] > 0

            def seg_body(c):
                sp, nn, lv, rd, sm = c
                # t tightened by the previous segment's drain
                sp, n_q, nn, rd, sm = walk_segment(
                    sp, t_ref[...], nn, rd, sm
                )
                lv = lv + n_q
                drain(n_q)
                return sp, nn, lv, rd, sm

            out = lax.while_loop(
                seg_cond, seg_body, (sp0, nn_tot, lv_tot, rd_tot, sm_tot)
            )
            _, nn_tot, lv_tot, rd_tot, sm_tot = out

        if with_stats:
            gi = pl.program_id(0)
            stats_ref[gi, 0] = nn_tot
            stats_ref[gi, 1] = lv_tot
            stats_ref[gi, 2] = rd_tot
            stats_ref[gi, 3] = sm_tot

    return kernel


def _leaf_tri_anyhit(leaf_row, count, ox, oy, oz, dx, dy, dz, t_limit, occ,
                     gate, leaf_width: int = WIDTH):
    """Any-hit MT test: latch occlusion, no prim/bary bookkeeping.

    `gate` masks lanes allowed to latch (boolean and/or only -- Mosaic
    cannot lower select_n on i1 vectors)."""
    from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
        TRI_STRIDE,
        _vcell,
    )

    rows = ox.shape[0]
    for j in range(leaf_width):
        base = j * TRI_STRIDE
        v0x, v0y, v0z = (_vcell(leaf_row, base + k, rows) for k in range(3))
        e1x, e1y, e1z = (_vcell(leaf_row, base + 3 + k, rows) for k in range(3))
        e2x, e2y, e2z = (_vcell(leaf_row, base + 6 + k, rows) for k in range(3))
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= 1e-8
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        bu = (tvx * px + tvy * py + tvz * pz) * inv_det
        ok = ok & (bu >= 0.0) & (bu <= 1.0)
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        bv = (dx * qx + dy * qy + dz * qz) * inv_det
        ok = ok & (bv >= 0.0) & (bu + bv <= 1.0)
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok & (t > T_EPS) & (t < t_limit) & (j < count)
        # occ is a 0/1 latch in the caller's dtype (f32 when carried through
        # scf loops -- Mosaic cannot carry i1 vectors -- i32 when it lives
        # in an output ref)
        occ = jnp.maximum(occ, (ok & gate).astype(occ.dtype))
    return occ


def _leaf_sph_anyhit(leaf_row, count, ox, oy, oz, dx, dy, dz, t_limit, occ,
                     gate, leaf_width: int = WIDTH):
    from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
        SPH_STRIDE,
        _vcell,
    )

    rows = ox.shape[0]
    for j in range(leaf_width):
        base = j * SPH_STRIDE
        cx, cy, cz = (_vcell(leaf_row, base + k, rows) for k in range(3))
        r = _vcell(leaf_row, base + 3, rows)
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv2a = 1.0 / (2.0 * a)
        t0 = (-b - sq) * inv2a
        t1 = (-b + sq) * inv2a
        t = jnp.where(t0 >= T_EPS, t0, t1)
        ok = ok & (t >= T_EPS) & (t < t_limit) & (r > 0.0) & (j < count)
        occ = jnp.maximum(occ, (ok & gate).astype(occ.dtype))
    return occ


def _make_shadow_kernel(meta, tile_rows: int, front: int,
                        stack_cap: int = STACK_CAP,
                        leaf_width: int = WIDTH,
                        drain_unroll: int | None = None):
    """Any-hit occlusion kernel: first accepted hit latches a lane; the walk
    drops occluded lanes from every mask and exits once all lanes resolve."""
    if drain_unroll is None:
        drain_unroll = DRAIN_UNROLL

    # subtile-gated drain as in _make_closest_kernel: the occluded latch
    # lives in the i32 output ref so pl.when updates (8,128) slices of only
    # the subtiles that want each leaf.
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(wc_ref, wb_ref, wp_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               occ_ref, stack_ref, queue_ref):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]
        active0 = t_limit > 0.0

        occ_ref[...] = jnp.zeros(shape, jnp.int32)

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
                & (occ_ref[...] == 0)
            )
            octant = _packet_octant(dx, dy, dz)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def drain(n_q):
                # DRAIN_UNROLL leaves are decoded and their rows loaded
                # up-front each iteration so the dependent VMEM loads
                # pipeline; ~half the per-row cost is scalar/load latency,
                # not VPU work (BENCHLOG roofline memo). enc >= 0 always,
                # so decode uses shifts, not div/mod, on the scalar core.
                def leaf_body(qq, carry):
                    q0 = qq * drain_unroll
                    loaded = []
                    for u in range(drain_unroll):
                        qi = q0 + u
                        valid = qi < n_q
                        packed = queue_ref[jax.lax.select(
                            valid, qi, jnp.int32(QUEUE_CAP + WIDTH * front)
                        )]
                        # invalid tail -> sub=0: every subtile gate skips
                        packed = jax.lax.select(valid, packed, jnp.int32(0))
                        sub = packed >> _Q_MASK_SHIFT
                        enc = packed & ((1 << _Q_MASK_SHIFT) - 1)
                        first = enc >> 4
                        count = enc & 15
                        if kind == BLAS_TRI_MESH:
                            leaf_row = tri_ref[pl.ds(first, 1), :]
                        else:
                            leaf_row = sph_ref[pl.ds(first, 1), :]
                        loaded.append((sub, count, leaf_row))
                    for sub, count, leaf_row in loaded:
                      for s in range(n_sub):
                        @pl.when(((sub >> s) & 1) != 0)
                        def _(s=s, count=count, leaf_row=leaf_row):
                            sl = slice(s * sub_rows, (s + 1) * sub_rows)
                            occ_b = occ_ref[sl, :]
                            if kind == BLAS_TRI_MESH:
                                occ_n = _leaf_tri_anyhit(
                                    leaf_row, count,
                                    ox[sl], oy[sl], oz[sl],
                                    dx[sl], dy[sl], dz[sl],
                                    t_limit[sl], occ_b, active0[sl],
                                    leaf_width,
                                )
                            else:
                                occ_n = _leaf_sph_anyhit(
                                    leaf_row, count,
                                    ox[sl], oy[sl], oz[sl],
                                    dx[sl], dy[sl], dz[sl],
                                    t_limit[sl], occ_b, active0[sl],
                                    leaf_width,
                                )
                            occ_ref[sl, :] = occ_n
                    return carry

                n_grp = (n_q + drain_unroll - 1) // drain_unroll
                return lax.fori_loop(0, n_grp, leaf_body, jnp.int32(0))

            def seg_cond(sp):
                return sp > 0

            def seg_body(sp):
                open_mask = active0 & (occ_ref[...] == 0)

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
                    # near-first queue order (reverse rank pushes far first,
                    # so near leaves drain first): occluders tend to sit
                    # close to the origin, and an early latch lets the
                    # whole-packet exit fire sooner
                    for has, wid in reversed(popped):
                        base_b = wid * 48
                        base_c = wid * 8
                        perm = wp_ref[base_c + octant]
                        for rank in range(WIDTH - 1, -1, -1):
                            c8 = (perm >> (rank * 4)) & 7
                            child = wc_ref[base_c + c8]
                            mask = _child_slab(
                                wb_ref, base_b + c8 * 6,
                                ox, oy, oz, ix, iy, iz, T_INF,
                            ) & open_mask
                            wants = [
                                jnp.any(mask[s * sub_rows:(s + 1) * sub_rows, :])
                                for s in range(n_sub)
                            ]
                            any_w = wants[0]
                            for wnt in wants[1:]:
                                any_w = any_w | wnt
                            hit = any_w & (child != _EMPTY) & has
                            is_inner = child >= 0
                            do_push = hit & is_inner
                            slot = jax.lax.select(
                                do_push, sp, jnp.int32(stack_cap)
                            )
                            stack_ref[slot] = child
                            sp = sp + jax.lax.select(do_push, 1, 0)
                            do_q = hit & (~is_inner)
                            qslot = jax.lax.select(
                                do_q, n_q, jnp.int32(QUEUE_CAP + WIDTH * front)
                            )
                            submask = jnp.int32(0)
                            for s, wnt in enumerate(wants):
                                submask = submask + jax.lax.select(
                                    wnt, jnp.int32(1 << s), jnp.int32(0)
                                )
                            queue_ref[qslot] = (
                                (-child - 2) + (submask << _Q_MASK_SHIFT)
                            )
                            n_q = n_q + jax.lax.select(do_q, 1, 0)
                    return sp, n_q

                sp, n_q = lax.while_loop(
                    walk_cond, walk_body, (sp, jnp.int32(0))
                )
                drain(n_q)
                # early exit: stop the whole walk once every lane resolved
                any_open = jnp.any(active0 & (occ_ref[...] == 0))
                return jax.lax.select(any_open, sp, jnp.int32(0))

            lax.while_loop(seg_cond, seg_body, sp0)

    return kernel


def _pad_tiles(x, tile_rows, n):
    tile = tile_rows * _LANES
    n_pad = -(-n // tile) * tile
    g = n_pad // tile
    return jnp.pad(x, (0, n_pad - n)).reshape(g * tile_rows, _LANES), g


@functools.partial(
    jax.jit,
    static_argnames=("meta", "interpret", "tile_rows", "front", "stack_cap",
                     "leaf_width", "with_stats", "drain_unroll"),
)
def _run_trace(arrays, meta, o, d, t_max, interpret=False,
               tile_rows=TILE_ROWS, front=FRONT, stack_cap=STACK_CAP,
               leaf_width=WIDTH, with_stats=False, drain_unroll=None):
    (wide_child, wide_bounds, wide_perm, tri_rows, sph_rows,
     tri_v0e, inst_w2o) = arrays
    n = o.shape[0]
    ox, g = _pad_tiles(o[:, 0], tile_rows, n)
    oy, _ = _pad_tiles(o[:, 1], tile_rows, n)
    oz, _ = _pad_tiles(o[:, 2], tile_rows, n)
    dx, _ = _pad_tiles(d[:, 0], tile_rows, n)
    dy, _ = _pad_tiles(d[:, 1], tile_rows, n)
    dz, _ = _pad_tiles(d[:, 2], tile_rows, n)
    tm, _ = _pad_tiles(t_max, tile_rows, n)

    ray_spec = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, s1, s2, s3: (i, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_closest_kernel(meta, tile_rows, front, stack_cap,
                                  leaf_width, with_stats, drain_unroll)
    shp = (g * tile_rows, _LANES)
    out_shape = [
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
    ]
    out_specs = [ray_spec] * 2
    if with_stats:
        out_shape.append(jax.ShapeDtypeStruct((g, 4), jnp.int32))
        # full-array SMEM output indexed by program_id (a (1,4) block fails
        # the TPU (8,128)-divisibility rule for blocked specs)
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[full, full] + [ray_spec] * 7,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.SMEM((stack_cap + 1,), jnp.int32),
                pltpu.SMEM((QUEUE_CAP + WIDTH * front + 1,), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(wide_child, wide_bounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    t, pp = res[0].reshape(-1)[:n], res[1].reshape(-1)[:n]
    if with_stats:
        return t, pp, res[2]
    return t, pp


def _decode_pp(tri_v0e, inst_w2o, o, d, t, pp, need_bary: bool = True):
    """Decode the kernel's packed (t, prim|inst) record and recompute
    barycentrics in XLA: a gather of the winning triangle per lane + one
    Moller-Trumbore evaluation in object space. This is the per-lane
    data-dependent access the kernel cannot do (SMEM/VMEM table lookups
    cap at ~1k entries on TPU) and XLA does at HBM bandwidth; it costs ~1
    HBM pass over the ray batch vs the three output refs it removes from
    every drain update in the kernel. Stand-alone so the sorted-trace path
    (ops/sort.sorted_closest_packed) can un-permute the TWO packed fields
    and decode in original lane order against the caller's un-gathered
    o/d."""
    miss = pp < 0
    prim = jnp.where(miss, -1, pp & _PP_PRIM_MASK)
    inst = jnp.where(miss, -1, pp >> PP_PRIM_BITS)
    if not need_bary:
        zero = jnp.zeros_like(t)
        return t, prim, inst, zero, zero
    tri_hit = (~miss) & ((inst & 3) == KIND_TRI)
    idx = jnp.where(tri_hit, prim, 0)
    rows9 = jnp.take(tri_v0e, idx, axis=0)
    m12 = jnp.take(inst_w2o, jnp.where(tri_hit, inst >> 2, 0), axis=0)
    # affine rows are (r0x r0y r0z tx r1x r1y r1z ty r2x r2y r2z tz)
    ox3, oy3, oz3 = o[:, 0], o[:, 1], o[:, 2]
    dx3, dy3, dz3 = d[:, 0], d[:, 1], d[:, 2]
    o_obj = jnp.stack([
        m12[:, 0] * ox3 + m12[:, 1] * oy3 + m12[:, 2] * oz3 + m12[:, 3],
        m12[:, 4] * ox3 + m12[:, 5] * oy3 + m12[:, 6] * oz3 + m12[:, 7],
        m12[:, 8] * ox3 + m12[:, 9] * oy3 + m12[:, 10] * oz3 + m12[:, 11],
    ], axis=-1)
    d_obj = jnp.stack([
        m12[:, 0] * dx3 + m12[:, 1] * dy3 + m12[:, 2] * dz3,
        m12[:, 4] * dx3 + m12[:, 5] * dy3 + m12[:, 6] * dz3,
        m12[:, 8] * dx3 + m12[:, 9] * dy3 + m12[:, 10] * dz3,
    ], axis=-1)
    _ok, _t2, bu, bv = intersect_triangle(
        o_obj, d_obj, rows9[:, 0:3], rows9[:, 3:6], rows9[:, 6:9]
    )
    bu = jnp.where(tri_hit, bu, 0.0)
    bv = jnp.where(tri_hit, bv, 0.0)
    return t, prim, inst, bu, bv


def _pp_to_record(t, prim, inst, bu, bv) -> "HitRecord":
    miss = prim < 0
    kind = jnp.where(miss, 0, inst & 3)
    return HitRecord(
        t=jnp.where(miss, T_INF, t),
        kind=kind,
        prim=prim,
        inst=jnp.where(miss, -1, inst >> 2),
        bu=bu,
        bv=bv,
    )


@functools.partial(jax.jit, static_argnames=("need_bary",))
def _decode_jit(tri_v0e, inst_w2o, o, d, t, pp, need_bary=True):
    return _pp_to_record(*_decode_pp(tri_v0e, inst_w2o, o, d, t, pp,
                                     need_bary))


def decode_wide_hits(wscene: "WideScene", o, d, t, pp) -> "HitRecord":
    """XLA epilogue for trace_closest_wide_packed: packed record ->
    HitRecord with barycentrics, in whatever lane order (o, d, t, pp)
    share. Jitted so eager callers get the same fused FP contraction the
    epilogue had when it lived inside _run_trace's jit (bit-exactness to
    the XLA oracle on graze lanes depends on it). When the prepared scene
    has needs_bary=False, bu/bv are returned as zeros without the gather
    (no consumer reads them on such scenes)."""
    return _decode_jit(wscene.tri_v0e, wscene.inst_w2o, o, d, t, pp,
                       wscene.needs_bary)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "interpret", "tile_rows", "front", "stack_cap",
                     "leaf_width"),
)
def _run_shadow(arrays, meta, o, d, t_max, interpret=False,
                tile_rows=TILE_ROWS, front=FRONT, stack_cap=STACK_CAP,
                leaf_width=WIDTH):
    wide_child, wide_bounds, wide_perm, tri_rows, sph_rows = arrays[:5]
    n = o.shape[0]
    ox, g = _pad_tiles(o[:, 0], tile_rows, n)
    oy, _ = _pad_tiles(o[:, 1], tile_rows, n)
    oz, _ = _pad_tiles(o[:, 2], tile_rows, n)
    dx, _ = _pad_tiles(d[:, 0], tile_rows, n)
    dy, _ = _pad_tiles(d[:, 1], tile_rows, n)
    dz, _ = _pad_tiles(d[:, 2], tile_rows, n)
    tm, _ = _pad_tiles(t_max, tile_rows, n)

    ray_spec = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, s1, s2, s3: (i, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_shadow_kernel(meta, tile_rows, front, stack_cap,
                                 leaf_width)
    shp = (g * tile_rows, _LANES)
    occ = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shp, jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[full, full] + [ray_spec] * 7,
            out_specs=ray_spec,
            scratch_shapes=[
                pltpu.SMEM((stack_cap + 1,), jnp.int32),
                pltpu.SMEM((QUEUE_CAP + WIDTH * front + 1,), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(wide_child, wide_bounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    return occ.reshape(-1)[:n] != 0


def with_mesh(wscene: WideScene, mesh) -> WideScene:
    """Attach a device mesh: traces shard rays over mesh axis "px"."""
    return wscene.replace(mesh=mesh)


def _shard_ray_op(mesh, run, n_out: int, o, d, t_max):
    """Run `run(o, d, t_max) -> n_out arrays` under shard_map over "px".

    Rays are padded to a device multiple (t_max 0 on pad lanes = inactive),
    each device traces its local shard against the replicated scene tables,
    outputs concatenate back. Traversal is embarrassingly parallel over
    rays, so there are no collectives inside; scene replication is the
    sharding design of SURVEY.md's parallelism axis (image-space data
    parallel)."""
    from jax import shard_map  # experimental.shard_map removed in jax 0.8+
    from jax.sharding import PartitionSpec as P

    n = o.shape[0]
    n_dev = int(mesh.devices.size)
    n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        o = jnp.pad(o, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)))
        t_max = jnp.pad(t_max, (0, n_pad - n))
    out = shard_map(
        run, mesh=mesh,
        in_specs=(P("px"), P("px"), P("px")),
        out_specs=(P("px"),) * n_out,
        check_vma=False,
    )(o, d, t_max)
    return tuple(x[:n] for x in out)


def _arrays(wscene: WideScene):
    return (
        wscene.wide_child, wscene.wide_bounds, wscene.wide_perm,
        wscene.tri_rows, wscene.sph_rows,
        wscene.tri_v0e, wscene.inst_w2o,
    )


def trace_closest_wide_packed(
    wscene: WideScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT, drain_unroll: int | None = None,
):
    """Kernel-only closest trace: returns the raw packed (t, prim|inst)
    record (two (N,) arrays, miss = pp < 0) WITHOUT the barycentric
    epilogue. The sorted path un-permutes just these two fields and runs
    decode_wide_hits in original lane order -- a (N,2) unsort gather
    instead of (N,6)."""
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
    if wscene.mesh is not None:
        arrays = _arrays(wscene)

        def run(oo, dd, tm):
            return _run_trace(
                arrays, wscene.meta, oo, dd, tm, interpret, tile_rows,
                front, wscene.stack_cap, wscene.leaf_width,
                drain_unroll=drain_unroll,
            )

        t, pp = _shard_ray_op(wscene.mesh, run, 2, o, d, t_max)
    else:
        t, pp = _run_trace(
            _arrays(wscene), wscene.meta, o, d, t_max, interpret, tile_rows,
            front, wscene.stack_cap, wscene.leaf_width,
            drain_unroll=drain_unroll,
        )
    return t, pp


def trace_closest_wide(
    wscene: WideScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT, drain_unroll: int | None = None,
) -> HitRecord:
    t, pp = trace_closest_wide_packed(
        wscene, o, d, active=active, t_max=t_max, interpret=interpret,
        tile_rows=tile_rows, front=front, drain_unroll=drain_unroll,
    )
    return decode_wide_hits(wscene, o, d, t, pp)


def trace_closest_wide_stats(
    wscene: WideScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
):
    """trace_closest_wide + per-packet traversal counters.

    Returns (HitRecord, stats (g, 4) i32): per packet [wide nodes popped,
    leaf rows drained, sync rounds, 0]. Feeds the v5e roofline memo
    (BENCHLOG.md): node/leaf visit UNIONS per packet are the quantities the
    packet design's cost model is built from."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    t, pp, stats = _run_trace(
        _arrays(wscene), wscene.meta, o, d, t_max, interpret, tile_rows,
        front, wscene.stack_cap, wscene.leaf_width, True,
    )
    return decode_wide_hits(wscene, o, d, t, pp), stats


def shadow_occlusion_wide(
    wscene: WideScene, o, d, t_max_world, active=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
):
    """Dedicated any-hit kernel with per-lane first-hit latching and
    whole-packet early exit (SceneDeviceViews.cs:88-121 capability)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    t_max = jnp.broadcast_to(
        jnp.asarray(t_max_world, jnp.float32), (n,)
    )
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    assert front <= MAX_FRONT, f"front={front} exceeds MAX_FRONT={MAX_FRONT}"
    if wscene.mesh is not None:
        arrays = _arrays(wscene)

        def run(oo, dd, tm):
            return (_run_shadow(
                arrays, wscene.meta, oo, dd, tm, interpret, tile_rows,
                front, wscene.stack_cap, wscene.leaf_width,
            ),)

        (occ,) = _shard_ray_op(wscene.mesh, run, 1, o, d, t_max)
        return occ
    return _run_shadow(
        _arrays(wscene), wscene.meta, o, d, t_max, interpret, tile_rows,
        front, wscene.stack_cap, wscene.leaf_width,
    )
