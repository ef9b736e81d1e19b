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
* the 8-wide SMEM node tables shrink with the coarser leaves, and child
  bounds are u8-quantized against a per-node frame (88 B/node of
  bounds+frame vs 192 B f32), so a 1M-tri scene affords leaf=64 builds
  (~21k leaves -> ~5.3k wide nodes = ~0.8 MB SMEM) -- half the leaf-drain
  MT work of leaf=128. The scalar walk is otherwise unchanged from
  wide_kernel v4 (FRONT-node frontier, octant-ordered children, packet
  early-exit); dequantization adds ~12 scalar int ops per child visit.

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
from ilgpu_raytracing_tpu.ops.intersect import (
    T_EPS,  # noqa: F401 (re-exported for kernel-variant experiments)
    T_INF,
    intersect_triangle,
)
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI, HitRecord
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    _LANES,
    LEAF_WIDTH,
    TRI_STRIDE,
    SPH_STRIDE,
    _inv,
    _is_identity,
    _scene_needs_bary,
    _transform,
)
from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import (
    _EMPTY,
    _pp_to_record,
    _stack_bound,
    MAX_FRONT,
    _instance_enter,
    _leaf_sph_anyhit,
    _leaf_sph_test_pp,
    _leaf_tri_anyhit,
    _leaf_tri_test_pp,
    _octant_perms,
    _packet_octant,
    WIDTH,
)

# 2048-lane packets: measured optimum for the streaming kernel's scene
# class (1M-tri terrain sweep: tile_rows 32/16/8 -> 2020/1935/1948 ms per
# frame; smaller packets cut per-leaf union waste faster than they add
# walk rounds, unlike the VMEM wide kernel where 32 wins). QUEUE_CAP
# 96/128 measured no better than 48 at leaf=64.
TILE_ROWS = 16
FRONT = 4
STACK_CAP = 256
QUEUE_CAP = 48  # coarse leaves: fewer queue slots needed per drain round
ROWS_PER_LEAF = 16  # 128 tris per leaf = one 8 KB DMA burst

# leaf encoding: 5 bits of row count (1..16), row index above
_ENC_BASE = 32

# queue entries carry the leaf encoding in bits 0..24 and a per-(8,128)
# subtile want mask above (wide_kernel's subtile-gated drain, ported):
# the drain tests ONLY subtiles whose child-slab test wanted the leaf.
_SQ_MASK_SHIFT = 25
_SQ_ENC_MASK = (1 << _SQ_MASK_SHIFT) - 1
SUB_ROWS = 8  # one native (8,128) vreg per subtile

# closest-hit record packing (wide_kernel's two-ref record, ported): prim
# id in the low bits, instance encoding above; barycentrics recomputed in
# an XLA epilogue against the winning triangle. Stream scenes reach 4M
# tris, so the prim field is wider than wide_kernel's.
SPP_PRIM_BITS = 23
_SPP_PRIM_MASK = (1 << SPP_PRIM_BITS) - 1


def _leaf_enc(first_row: int, n_rows: int) -> int:
    assert 1 <= n_rows <= ROWS_PER_LEAF
    return -(first_row * _ENC_BASE + n_rows) - 2


@struct.dataclass
class StreamScene:
    """8-wide node tables (SMEM) + HBM-resident triangle rows."""

    # Node tables are SMEM scalar-prefetch. Child bounds are u8-QUANTIZED
    # against a per-node frame (lo, ext/255): 88 B/node of bounds+frame vs
    # 192 B/node of f32 bounds, so a 1M-tri scene affords leaf=64 builds
    # (half the leaf-drain MT work of leaf=128) inside the SMEM budget.
    # Quantized boxes round OUTWARD in the exact f32 arithmetic the kernel
    # dequantizes with, so the walk can only add visits -- results stay
    # oracle-exact.
    wide_frame: jnp.ndarray  # (W*6,) f32: per node lo.xyz, (ext/255).xyz
    wide_qbounds: jnp.ndarray  # (W*16,) i32: per child 2 words of 6 u8s
    wide_child: jnp.ndarray  # (W*8,) i32
    wide_perm: jnp.ndarray  # (W*8,) i32 per-octant child order
    tri_rows: jnp.ndarray  # (Lt, 128) f32, HBM (memory_space=ANY) --
    # or VMEM when `resident` (small scenes with coarse leaves)
    sph_rows: jnp.ndarray  # (Ls, 128) f32, VMEM
    # HBM tables for the barycentric decode epilogue (see wide_kernel):
    # fused per-prim object-space (v0|e1|e2) rows -- ONE gather per decode
    # instead of three -- and per-instance world->object affines
    tri_v0e: jnp.ndarray = None  # (T, 9) f32
    inst_w2o: jnp.ndarray = None  # (I, 12) f32
    meta: tuple = struct.field(pytree_node=False, default=())
    resident: bool = struct.field(pytree_node=False, default=False)
    # static max rows of any leaf (drain unrolls exactly this many)
    rows_per_leaf: int = struct.field(pytree_node=False, default=ROWS_PER_LEAF)
    # per-scene worst-case stack occupancy (wide_kernel._stack_bound); SMEM
    # stack scratch is sized from this, so overflow is impossible
    stack_cap: int = struct.field(pytree_node=False, default=STACK_CAP)
    # False => decode skips the bary gather+MT redo and returns bu=bv=0
    # (valid when no tri material has a diffuse texture and no alpha; see
    # traverse_kernel._scene_needs_bary)
    needs_bary: bool = struct.field(pytree_node=False, default=True)
    # Optional jax.sharding.Mesh with axis "px": traces dispatch through
    # shard_map over the mesh -- each device walks its ray shard against
    # replicated node tables / HBM triangle rows (BASELINE config 5 "across
    # a TPU slice"; image-space data parallelism, SURVEY.md parallelism
    # axis). Set via with_mesh(); same contract as wide_kernel.WideScene.
    mesh: object = struct.field(pytree_node=False, default=None)
    # (T,6) world-space treelet AABBs for the DESTINATION sort key
    # (models/bvh.cut_scene_treelets; consumed by ops/sort._ray_perm when
    # config.sort_stream_treelet_key): measured 1.16x bounce closest /
    # 1.38x sun shadow over origin-morton at 1M tris (BENCHLOG round 4)
    sortkey_bounds: jnp.ndarray = None


def with_mesh(sscene: StreamScene, mesh) -> StreamScene:
    """Attach a device mesh: traces shard rays over mesh axis "px"."""
    return sscene.replace(mesh=mesh)


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
    wf_all, wq_all = _quantize_bounds(wb_all, wc_all)
    smem_bytes = (wf_all.size + wq_all.size + wc_all.size + perms.size) * 4
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

    # packed-record bounds: prim ids must fit SPP_PRIM_BITS, leaf encodings
    # must fit below the queue's submask bits, instance encodings above the
    # prim field
    n_prims = max(int(scene.tri_v0.shape[0]), int(scene.sph_center.shape[0]))
    assert n_prims <= (1 << SPP_PRIM_BITS), (
        f"{n_prims} primitives overflow the {SPP_PRIM_BITS}-bit packed hit "
        f"record"
    )
    max_inst = max((m[4] for m in meta), default=0)
    assert max_inst * 4 + 3 < (1 << (31 - SPP_PRIM_BITS)), (
        f"instance id {max_inst} overflows the packed hit record"
    )
    assert (total_rows + ROWS_PER_LEAF) * _ENC_BASE < (1 << _SQ_MASK_SHIFT), (
        f"{total_rows} leaf rows overflow the queue's leaf encoding bits"
    )
    inst_w2o = np.tile(
        np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32),
        (max_inst + 1, 1),
    )
    for kind, _wid, w2o, _wb, inst_id in meta:
        inst_w2o[inst_id] = np.asarray(w2o, np.float32)

    from ilgpu_raytracing_tpu.models.bvh import cut_scene_treelets

    return StreamScene(
        wide_frame=jnp.asarray(wf_all.reshape(-1)),
        wide_qbounds=jnp.asarray(wq_all.reshape(-1)),
        wide_child=jnp.asarray(wc_all.reshape(-1)),
        wide_perm=jnp.asarray(perms.reshape(-1).astype(np.int32)),
        sortkey_bounds=jnp.asarray(cut_scene_treelets(scene, 32)),
        tri_rows=jnp.asarray(tri),
        sph_rows=jnp.asarray(rows_or_dummy(sph_rows)),
        tri_v0e=jnp.concatenate(
            [jnp.asarray(scene.tri_v0, jnp.float32),
             jnp.asarray(scene.tri_e1, jnp.float32),
             jnp.asarray(scene.tri_e2, jnp.float32)], axis=1,
        ),
        inst_w2o=jnp.asarray(inst_w2o),
        meta=tuple(meta),
        resident=resident,
        rows_per_leaf=max_rows,
        stack_cap=max(int(cap), 64),
        needs_bary=_scene_needs_bary(scene),
    )


def _quantize_bounds(wb_all: np.ndarray, wc_all: np.ndarray):
    """u8-quantize per-child AABBs against each node's own frame.

    Returns (wf, wq): wf (n,6) f32 rows of [lo.xyz, scale.xyz] with
    scale = ext/255, and wq (n,16) i32 -- two words per child packing
    qlo.xyz | qhi.x and qhi.y | qhi.z as bytes. Quantized boxes are
    verified OUTWARD-conservative against the dequantization the kernel
    performs (lo + f32(q) * scale, with a 2-ulp margin for a possible
    scalar-FMA contraction), so traversal can only visit a superset of the
    exact-bounds visits: hit results are unchanged."""
    lo = wb_all[:, :, 0:3].astype(np.float32)
    hi = wb_all[:, :, 3:6].astype(np.float32)
    occ = (wc_all != _EMPTY)[:, :, None]
    flo64 = np.where(occ, lo, np.inf).min(axis=1).astype(np.float64)
    fhi64 = np.where(occ, hi, -np.inf).max(axis=1).astype(np.float64)
    flo = flo64.astype(np.float32)
    over = flo.astype(np.float64) > flo64
    flo = np.where(over, np.nextafter(flo, np.float32(-np.inf)), flo)
    fs = ((fhi64 - flo.astype(np.float64)) / 255.0).astype(np.float32)
    # ensure the frame's top (q=255) covers fhi in f32
    for _ in range(4):
        top = flo + np.float32(255.0) * fs
        short = top.astype(np.float64) < fhi64
        if not short.any():
            break
        fs = np.where(short, np.nextafter(fs, np.float32(np.inf)), fs)

    flo_b = flo[:, None, :]
    fs_b = fs[:, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        qlo = np.floor((lo - flo_b) / fs_b)
        qhi = np.ceil((hi - flo_b) / fs_b)
    qlo = np.clip(np.nan_to_num(qlo, nan=0.0, posinf=255.0, neginf=0.0),
                  0, 255)
    qhi = np.clip(np.nan_to_num(qhi, nan=0.0, posinf=255.0, neginf=0.0),
                  0, 255)
    # conservative fix-up in the kernel's own f32 arithmetic, with a 2-ulp
    # margin on the target (Mosaic may contract the dequant mul+add to FMA)
    lo_t = np.nextafter(np.nextafter(lo, np.float32(-np.inf)),
                        np.float32(-np.inf))
    hi_t = np.nextafter(np.nextafter(hi, np.float32(np.inf)),
                        np.float32(np.inf))
    for _ in range(8):
        dlo = flo_b + qlo.astype(np.float32) * fs_b
        dhi = flo_b + qhi.astype(np.float32) * fs_b
        bad_lo = occ & (dlo > lo_t) & (qlo > 0)
        bad_hi = occ & (dhi < hi_t) & (qhi < 255)
        if not (bad_lo.any() or bad_hi.any()):
            break
        qlo = np.where(bad_lo, qlo - 1, qlo)
        qhi = np.where(bad_hi, qhi + 1, qhi)
    dlo = flo_b + qlo.astype(np.float32) * fs_b
    dhi = flo_b + qhi.astype(np.float32) * fs_b
    occm = np.broadcast_to(occ, dlo.shape)
    assert (dlo[occm] <= lo[occm]).all() and (dhi[occm] >= hi[occm]).all(), (
        "quantized child bounds failed to cover exact bounds"
    )

    q = np.concatenate([qlo, qhi], axis=2).astype(np.uint32)  # (n,8,6)
    w0 = q[:, :, 0] | (q[:, :, 1] << 8) | (q[:, :, 2] << 16) \
        | (q[:, :, 3] << 24)
    w1 = q[:, :, 4] | (q[:, :, 5] << 8)
    wq = np.stack([w0, w1], axis=2).reshape(len(q), 16).view(np.int32)
    wf = np.concatenate([flo, fs], axis=1).astype(np.float32)  # (n,6)
    return wf, wq


def _child_slab_q(x0, y0, z0, x1, y1, z1, ox, oy, oz, ix, iy, iz, t_b):
    """Slab test against scalar bounds values (dequantized child box);
    same math and accept predicate as wide_kernel._child_slab."""
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
    lo = jnp.maximum(lo, T_EPS)
    return (hi >= lo) & (lo <= t_b)


def _walk_segment(wc_ref, wf_ref, wq_ref, wp_ref, stack_ref, queue_ref,
                  octant,
                  front, sp, t_b, ox, oy, oz, ix, iy, iz, open_mask,
                  stack_cap=STACK_CAP, n_sub: int = 1):
    """One frontier round: pop up to `front` wide nodes, push/queue children
    near-first. Shared by closest and shadow kernels. Queued leaves carry a
    per-subtile want mask in bits >= _SQ_MASK_SHIFT (the per-subtile anys
    pipeline with the full-tile any, so the mask is ~free)."""
    sub_rows = ox.shape[0] // n_sub

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
            base_f = wid * 6
            base_q = wid * 16
            base_c = wid * 8
            flox = wf_ref[base_f]
            floy = wf_ref[base_f + 1]
            floz = wf_ref[base_f + 2]
            fsx = wf_ref[base_f + 3]
            fsy = wf_ref[base_f + 4]
            fsz = wf_ref[base_f + 5]
            perm = wp_ref[base_c + octant]
            for rank in range(WIDTH - 1, -1, -1):
                c8 = (perm >> (rank * 4)) & 7
                child = wc_ref[base_c + c8]
                w0 = wq_ref[base_q + c8 * 2]
                w1 = wq_ref[base_q + c8 * 2 + 1]
                x0 = flox + (w0 & 255).astype(jnp.float32) * fsx
                y0 = floy + ((w0 >> 8) & 255).astype(jnp.float32) * fsy
                z0 = floz + ((w0 >> 16) & 255).astype(jnp.float32) * fsz
                x1 = flox + ((w0 >> 24) & 255).astype(jnp.float32) * fsx
                y1 = floy + (w1 & 255).astype(jnp.float32) * fsy
                z1 = floz + ((w1 >> 8) & 255).astype(jnp.float32) * fsz
                mask = _child_slab_q(
                    x0, y0, z0, x1, y1, z1, ox, oy, oz, ix, iy, iz, t_b
                )
                if open_mask is not None:
                    mask = mask & open_mask
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
                slot = jax.lax.select(do_push, sp, jnp.int32(stack_cap))
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
                queue_ref[qslot] = (-child - 2) + (submask << _SQ_MASK_SHIFT)
                n_q = n_q + jax.lax.select(do_q, 1, 0)
        return sp, n_q

    return lax.while_loop(walk_cond, walk_body, (sp, jnp.int32(0)))


def _start_dma(tri_hbm, buf_ref, sem, queue_ref, q, n_q, slot, rows):
    """Kick the DMA for queue entry q into double-buffer `slot` (masked)."""

    @pl.when(q < n_q)
    def _():
        packed = queue_ref[q] & _SQ_ENC_MASK
        first = packed // _ENC_BASE
        pltpu.make_async_copy(
            tri_hbm.at[pl.ds(first, rows), :],
            buf_ref.at[slot, pl.ds(0, rows)],
            sem.at[slot],
        ).start()


def _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot, rows):
    packed = queue_ref[q] & _SQ_ENC_MASK
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
    # hit state lives in TWO output refs (t + packed prim|inst, the wide
    # kernel's record) instead of five (32,128) loop carries: pl.when can
    # then update only the (8,128) subtiles whose walk-time slab test
    # wanted each leaf (most coarse leaves are wanted by 1-2 of 4 subtiles
    # on sorted bounce packets), and the 16-row unrolled drain loop stops
    # carrying 20 vregs of hit state. bu/bv are recomputed by the caller's
    # XLA epilogue. Hit/t/prim/inst results are bit-identical: a subtile
    # whose slab test failed at segment-start t cannot contain an accepted
    # hit (t only shrinks), and the per-row test order is unchanged.
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(wc_ref, wf_ref, wq_ref, wp_ref, tri_hbm, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, pp_ref,
               stack_ref, queue_ref, buf_ref, sem):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

        t_ref[...] = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        pp_ref[...] = jnp.full(shape, -1, jnp.int32)

        for kind, wide_root, w2o, wbounds, inst_id in meta:
            # inst id + kind as one constant; caller decodes with shifts
            inst_enc = inst_id * 4 + (
                KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
            )
            inst_bits = inst_enc << SPP_PRIM_BITS
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

            def sub_update(sub, leaf_row, cnt, tri: bool):
                for s in range(n_sub):
                    @pl.when(((sub >> s) & 1) != 0)
                    def _(s=s, leaf_row=leaf_row, cnt=cnt):
                        sl = slice(s * sub_rows, (s + 1) * sub_rows)
                        t_b = t_ref[sl, :]
                        pp_b = pp_ref[sl, :]
                        test = _leaf_tri_test_pp if tri else _leaf_sph_test_pp
                        t_n, pp_n = test(
                            leaf_row, cnt,
                            ox[sl], oy[sl], oz[sl],
                            dx[sl], dy[sl], dz[sl],
                            t_b, pp_b, inst_bits, LEAF_WIDTH,
                        )
                        t_ref[sl, :] = t_n
                        pp_ref[sl, :] = pp_n

            def drain_tri(n_q):
                if not resident:
                    _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                               jnp.int32(0), n_q, jnp.int32(0),
                               rows_per_leaf)

                def leaf_body(q, carry):
                    packed = queue_ref[q]
                    sub = packed >> _SQ_MASK_SHIFT
                    enc = packed & _SQ_ENC_MASK
                    first = enc // _ENC_BASE
                    slot = q % 2
                    if not resident:
                        _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot,
                                  rows_per_leaf)
                        _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                                   q + 1, n_q, (q + 1) % 2,
                                   rows_per_leaf)
                    n_rows = enc % _ENC_BASE
                    for r in range(rows_per_leaf):
                        # skip rows past the leaf's fill entirely (SAH
                        # leaves average ~12/16 rows); padding row slots
                        # hold zero-triangles, so testing the full row
                        # width on kept rows is today's exact semantics
                        @pl.when(r < n_rows)
                        def _(r=r, sub=sub, first=first, slot=slot):
                            if resident:
                                leaf_row = tri_hbm[pl.ds(first + r, 1), :]
                            else:
                                leaf_row = buf_ref[slot, pl.ds(r, 1), :]
                            sub_update(sub, leaf_row, jnp.int32(LEAF_WIDTH),
                                       tri=True)
                    return carry

                return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

            def drain_sph(n_q):
                def leaf_body(q, carry):
                    packed = queue_ref[q]
                    sub = packed >> _SQ_MASK_SHIFT
                    first = (packed & _SQ_ENC_MASK) // _ENC_BASE
                    leaf_row = sph_ref[pl.ds(first, 1), :]
                    sub_update(sub, leaf_row, jnp.int32(LEAF_WIDTH),
                               tri=False)
                    return carry

                return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

            def seg_cond(sp):
                return sp > 0

            def seg_body(sp):
                t_b = t_ref[...]  # tightened by the previous segment
                sp, n_q = _walk_segment(
                    wc_ref, wf_ref, wq_ref, wp_ref, stack_ref, queue_ref,
                    octant,
                    front, sp, t_b, ox, oy, oz, ix, iy, iz, None,
                    stack_cap, n_sub,
                )
                if kind == BLAS_TRI_MESH:
                    drain_tri(n_q)
                else:
                    drain_sph(n_q)
                return sp

            lax.while_loop(seg_cond, seg_body, sp0)

    return kernel


def _make_shadow_kernel(meta, tile_rows: int, front: int,
                        resident: bool = False,
                        rows_per_leaf: int = ROWS_PER_LEAF,
                        stack_cap: int = STACK_CAP):
    # The occlusion latch lives in the i32 output ref (0/1) instead of an
    # f32 loop carry, so leaf drains can update ONLY the (8,128) subtiles
    # whose walk-time slab test wanted each leaf (the walk folds the
    # open-lane mask in, so fully-occluded subtiles also drop out). With
    # 128-tri coarse leaves the previous full-tile drain MT-tested all 4
    # subtiles x 16 rows per queued leaf; sorted bounce packets want ~2/4.
    # Results are identical: occ only latches upward, and a subtile whose
    # segment-start slab test missed the leaf bounds (or that had no open
    # lanes) cannot gain an occlusion hit from that leaf's triangles.
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(wc_ref, wf_ref, wq_ref, wp_ref, tri_hbm, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               occ_ref, stack_ref, queue_ref, buf_ref, sem):
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
                & (occ_ref[...] < 1)
            )
            octant = _packet_octant(dx, dy, dz)
            sp0 = jax.lax.select(jnp.any(enter), jnp.int32(1), jnp.int32(0))
            stack_ref[0] = jnp.int32(wide_root)

            def sub_update(sub, leaf_row, cnt, tri: bool):
                for s in range(n_sub):
                    @pl.when(((sub >> s) & 1) != 0)
                    def _(s=s, leaf_row=leaf_row, cnt=cnt):
                        sl = slice(s * sub_rows, (s + 1) * sub_rows)
                        occ_b = occ_ref[sl, :]
                        test = _leaf_tri_anyhit if tri else _leaf_sph_anyhit
                        occ_ref[sl, :] = test(
                            leaf_row, cnt,
                            ox[sl], oy[sl], oz[sl],
                            dx[sl], dy[sl], dz[sl],
                            t_limit[sl], occ_b, active0[sl], LEAF_WIDTH,
                        )

            def drain_tri(n_q):
                if not resident:
                    _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                               jnp.int32(0), n_q, jnp.int32(0),
                               rows_per_leaf)

                def leaf_body(q, carry):
                    packed = queue_ref[q]
                    sub = packed >> _SQ_MASK_SHIFT
                    enc = packed & _SQ_ENC_MASK
                    first = enc // _ENC_BASE
                    slot = q % 2
                    if not resident:
                        _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot,
                                  rows_per_leaf)
                        _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                                   q + 1, n_q, (q + 1) % 2,
                                   rows_per_leaf)
                    n_rows = enc % _ENC_BASE
                    for r in range(rows_per_leaf):
                        # skip rows past the leaf's fill entirely (SAH
                        # leaves average ~12/16 rows); padding row slots
                        # hold zero-triangles, so testing the full row
                        # width on kept rows is today's exact semantics
                        @pl.when(r < n_rows)
                        def _(r=r, sub=sub, first=first, slot=slot):
                            if resident:
                                leaf_row = tri_hbm[pl.ds(first + r, 1), :]
                            else:
                                leaf_row = buf_ref[slot, pl.ds(r, 1), :]
                            sub_update(sub, leaf_row, jnp.int32(LEAF_WIDTH),
                                       tri=True)
                    return carry

                return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

            def drain_sph(n_q):
                def leaf_body(q, carry):
                    packed = queue_ref[q]
                    sub = packed >> _SQ_MASK_SHIFT
                    first = (packed & _SQ_ENC_MASK) // _ENC_BASE
                    leaf_row = sph_ref[pl.ds(first, 1), :]
                    sub_update(sub, leaf_row, jnp.int32(LEAF_WIDTH),
                               tri=False)
                    return carry

                return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

            def seg_cond(sp):
                return sp > 0

            def seg_body(sp):
                open_mask = active0 & (occ_ref[...] < 1)
                sp, n_q = _walk_segment(
                    wc_ref, wf_ref, wq_ref, wp_ref, stack_ref, queue_ref,
                    octant,
                    front, sp, T_INF, ox, oy, oz, ix, iy, iz, open_mask,
                    stack_cap, n_sub,
                )
                if kind == BLAS_TRI_MESH:
                    drain_tri(n_q)
                else:
                    drain_sph(n_q)
                any_open = jnp.any(active0 & (occ_ref[...] < 1))
                return jax.lax.select(any_open, sp, jnp.int32(0))

            lax.while_loop(seg_cond, seg_body, sp0)

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
        (tile_rows, _LANES), lambda i, s1, s2, s3, s4: (i, 0),
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
    (wide_child, wide_frame, wide_qbounds, wide_perm,
     tri_rows, sph_rows) = arrays
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
    ]
    t, pp = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(g,),
            in_specs=[hbm, vmem] + [ray_spec] * 7,
            out_specs=[ray_spec] * 2,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(wide_child, wide_frame, wide_qbounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    return t.reshape(-1)[:n], pp.reshape(-1)[:n]


def _decode_pp(tri_v0e, inst_w2o, o, d, t, pp, need_bary: bool = True):
    """Decode the packed (t, prim|inst) record; recompute bu/bv for
    recorded triangle hits with ONE XLA gather of the fused (v0|e1|e2) row
    per lane + a Moller-Trumbore evaluation in object space (see
    wide_kernel._decode_pp). Skipped entirely when need_bary=False (no
    consumer reads bary on texture/alpha-free scenes)."""
    miss = pp < 0
    prim = jnp.where(miss, -1, pp & _SPP_PRIM_MASK)
    inst = jnp.where(miss, -1, pp >> SPP_PRIM_BITS)
    if not need_bary:
        zero = jnp.zeros_like(t)
        return t, prim, inst, zero, zero
    tri_hit = (~miss) & ((inst & 3) == KIND_TRI)
    idx = jnp.where(tri_hit, prim, 0)
    rows9 = jnp.take(tri_v0e, idx, axis=0)
    m12 = jnp.take(inst_w2o, jnp.where(tri_hit, inst >> 2, 0), axis=0)
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


@functools.partial(jax.jit, static_argnames=("need_bary",))
def _decode_jit(tri_v0e, inst_w2o, o, d, t, pp, need_bary=True):
    return _pp_to_record(*_decode_pp(tri_v0e, inst_w2o, o, d, t, pp,
                                     need_bary))


def decode_stream_hits(sscene: "StreamScene", o, d, t, pp) -> HitRecord:
    """XLA decode epilogue for trace_closest_stream_packed, in whatever
    lane order (o, d, t, pp) share (see wide_kernel.decode_wide_hits)."""
    return _decode_jit(sscene.tri_v0e, sscene.inst_w2o, o, d, t, pp,
                       sscene.needs_bary)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "interpret", "tile_rows", "front", "resident",
                     "rows_per_leaf", "stack_cap"),
)
def _run_shadow(arrays, meta, o, d, t_max, interpret=False,
                tile_rows=TILE_ROWS, front=FRONT, resident=False,
                rows_per_leaf=ROWS_PER_LEAF, stack_cap=STACK_CAP):
    (wide_child, wide_frame, wide_qbounds, wide_perm,
     tri_rows, sph_rows) = arrays
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
            num_scalar_prefetch=4,
            grid=(g,),
            in_specs=[hbm, vmem] + [ray_spec] * 7,
            out_specs=ray_spec,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(wide_child, wide_frame, wide_qbounds, wide_perm, tri_rows, sph_rows,
      ox, oy, oz, dx, dy, dz, tm)
    return occ.reshape(-1)[:n] != 0


def _arrays(s: StreamScene):
    return (s.wide_child, s.wide_frame, s.wide_qbounds, s.wide_perm,
            s.tri_rows, s.sph_rows)


def trace_closest_stream_packed(
    sscene: StreamScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
):
    """Kernel-only closest trace: raw packed (t, prim|inst) record (miss
    = pp < 0), no decode. The sorted path un-permutes just these two
    fields and decodes in original lane order."""
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
    if sscene.mesh is not None:
        from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import _shard_ray_op

        arrays = _arrays(sscene)

        def run(oo, dd, tm):
            return _run_trace(
                arrays, sscene.meta, oo, dd, tm, interpret, tile_rows,
                front, sscene.resident, sscene.rows_per_leaf,
                sscene.stack_cap,
            )

        return _shard_ray_op(sscene.mesh, run, 2, o, d, t_max)
    return _run_trace(
        _arrays(sscene), sscene.meta, o, d, t_max, interpret, tile_rows,
        front, sscene.resident, sscene.rows_per_leaf, sscene.stack_cap,
    )


def trace_closest_stream(
    sscene: StreamScene, o, d, active=None, t_max=None,
    interpret: bool | None = None, tile_rows: int = TILE_ROWS,
    front: int = FRONT,
) -> HitRecord:
    t, pp = trace_closest_stream_packed(
        sscene, o, d, active=active, t_max=t_max, interpret=interpret,
        tile_rows=tile_rows, front=front,
    )
    return decode_stream_hits(sscene, o, d, t, pp)


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
    if sscene.mesh is not None:
        from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import _shard_ray_op

        arrays = _arrays(sscene)

        def run(oo, dd, tm):
            return (_run_shadow(
                arrays, sscene.meta, oo, dd, tm, interpret, tile_rows,
                front, sscene.resident, sscene.rows_per_leaf,
                sscene.stack_cap,
            ),)

        (occ,) = _shard_ray_op(sscene.mesh, run, 1, o, d, t_max)
        return occ
    return _run_shadow(
        _arrays(sscene), sscene.meta, o, d, t_max, interpret, tile_rows,
        front, sscene.resident, sscene.rows_per_leaf, sscene.stack_cap,
    )
