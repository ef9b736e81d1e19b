"""Pallas packet BVH traversal for TPU.

The performance path for the hot loop (SURVEY.md section 7 step 8): instead
of the XLA while_loop where every ray gathers its own node (ops/traverse.py),
a *packet* of rays (one grid program per tile) walks the skip-index BVH
together behind a single scalar `cur` pointer:

* node int fields (left, first, count, skip) live in SMEM via scalar
  prefetch and drive the walk as scalars -- zero vector->scalar traffic;
* node bounds are one VMEM row per node (dynamic sublane fetch + static
  lane extraction -- no gathers);
* leaf primitives are packed 8-per-row in leaf-slot order (8 tris x 12
  floats = 96 lanes; 8 spheres x 16 floats), so one leaf costs ONE dynamic
  row fetch; prim ids ride in the row as bitcast lanes;
* all lanes test the fetched node/leaf against their own ray (VPU), and the
  packet takes a branch if ANY lane wants it.

Per-packet extra work vs per-ray traversal is the node-visit union; for
coherent tiles (primary/shadow rays, sorted bounce rays) that union is close
to a single ray's visit count. In exchange every memory access is a
broadcast -- the design maps the reference's SIMT divergence problem
(SceneDeviceViews.cs:30-121) onto the TPU's vector+scalar split.

Instance transforms, world bounds, and BLAS roots are baked into the kernel
as python constants (scenes recompile when instances move; the dynamic-scene
path stays on the XLA tracer). Scenes must fit VMEM (~<150k tris);
`supports_scene` gates the fallback. Alpha-cutout scenes run through the
peeling wrappers in ops/alpha.py on top of this opaque kernel.
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
from ilgpu_raytracing_tpu.ops.traverse import (
    KIND_SPHERE,
    KIND_TRI,
    HitRecord,
)

TILE_ROWS = 32  # rays per packet = TILE_ROWS * 128
_LANES = 128
TRI_STRIDE = 12  # v0(3) e1(3) e2(3) prim_id_f32 pad(2)
SPH_STRIDE = 16  # center(3) radius prim_id_f32 pad(11)
LEAF_WIDTH = 8  # prims per leaf row


@struct.dataclass
class PallasScene:
    """Packed VMEM/SMEM-side scene + baked instance constants."""

    nodes_rows: jnp.ndarray  # (Nn, 128) f32: bmin3 bmax3 in lanes 0..5
    node_ifields: jnp.ndarray  # (Nn*4,) i32 flat (left, first_row, count,
    # skip) -- 1D because SMEM pads a trailing dim to 128 lanes
    tri_rows: jnp.ndarray  # (Lt, 128) f32 leaf-packed triangles
    sph_rows: jnp.ndarray  # (Ls, 128) f32 leaf-packed spheres
    # static: per-instance (kind, root, w2o 12 floats, world bounds 6 floats,
    # inst_id)
    meta: tuple = struct.field(pytree_node=False, default=())
    # max primitives in any packed leaf row: the kernels' per-leaf test loop
    # runs exactly this many iterations (a leaf-4 build pays 4 tri tests per
    # leaf visit, not LEAF_WIDTH=8 -- the row layout keeps 8 slots either way)
    leaf_width: int = struct.field(pytree_node=False, default=LEAF_WIDTH)
    # False when no triangle material samples a diffuse texture and the
    # scene has no alpha cutouts: hit barycentrics then never influence the
    # rendered image (shade_hits only uses bu/bv for UV interpolation,
    # alpha peeling for map_d lookups), so the packed-record decode can
    # skip its per-bounce triangle-table gather + Moller-Trumbore redo and
    # return bu = bv = 0. Downstream kernels inherit this flag.
    needs_bary: bool = struct.field(pytree_node=False, default=True)


def supports_scene(scene: SceneData, max_tris: int = 150_000) -> bool:
    """Geometry fits the VMEM/SMEM-resident kernel. Alpha-cutout scenes ARE
    supported: the integrator peels around the opaque kernel (ops/alpha.py)
    rather than testing masks in-traversal."""
    return scene.tri_v0.shape[0] <= max_tris


def prepare(scene: SceneData) -> PallasScene:
    """Host-side repack of a committed scene for the packet kernel."""
    nodes_bmin = np.asarray(scene.blas_bmin)
    nodes_bmax = np.asarray(scene.blas_bmax)
    ifields = np.asarray(scene.blas_ifields).copy()
    nn = ifields.shape[0]

    nodes_rows = np.zeros((nn, _LANES), np.float32)
    nodes_rows[:, 0:3] = nodes_bmin
    nodes_rows[:, 3:6] = nodes_bmax

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

    # which BLAS subtree does each node belong to? walk each instance's
    # subtree from its root to find its leaves (nodes are contiguous per
    # instance by construction, but roots order by build call).
    roots = np.asarray(scene.inst_blas_root)

    tri_rows: list[np.ndarray] = []
    sph_rows: list[np.ndarray] = []
    max_count = [1]

    def pack_leaf(kind: int, first: int, count: int) -> int:
        max_count[0] = max(max_count[0], min(count, LEAF_WIDTH))
        """Append one leaf row; returns its row index."""
        if kind == BLAS_TRI_MESH:
            row = np.zeros((_LANES,), np.float32)
            for j in range(min(count, LEAF_WIDTH)):
                p = int(tri_prim[first + j])
                base = j * TRI_STRIDE
                row[base : base + 3] = tri_v0[p]
                row[base + 3 : base + 6] = tri_e1[p]
                row[base + 6 : base + 9] = tri_e2[p]
                row[base + 9] = np.float32(p)  # ids < 2^24: exact in f32
            tri_rows.append(row)
            return len(tri_rows) - 1
        row = np.zeros((_LANES,), np.float32)
        for j in range(min(count, LEAF_WIDTH)):
            p = int(sph_prim[first + j])
            base = j * SPH_STRIDE
            row[base : base + 3] = sph_c[p]
            row[base + 3] = sph_r[p]
            row[base + 4] = np.float32(p)  # ids < 2^24: exact in f32
        sph_rows.append(row)
        return len(sph_rows) - 1

    # rewrite leaf `first` to packed row index, per instance subtree
    meta = []
    visited = np.zeros((nn,), bool)
    for inst_id, kind in sorted(inst_types.items()):
        root = int(roots[inst_id])
        stack = [root]
        while stack:
            cur = stack.pop()
            if cur < 0 or cur >= nn or visited[cur]:
                continue
            visited[cur] = True
            left, first, count, skip = ifields[cur]
            if count > 0:
                assert count <= LEAF_WIDTH, (
                    f"leaf count {count} > {LEAF_WIDTH}; build the scene "
                    f"with blas_leaf_size <= {LEAF_WIDTH} for the pallas path"
                )
                ifields[cur, 1] = pack_leaf(kind, first, count)
            else:
                stack.append(left)
                stack.append(cur + 1)  # right root
        w2o = tuple(np.asarray(scene.inst_w2o[inst_id]).reshape(-1).tolist())
        wb = tuple(
            np.asarray(scene.inst_bmin[inst_id]).tolist()
            + np.asarray(scene.inst_bmax[inst_id]).tolist()
        )
        meta.append((int(kind), root, w2o, wb, int(inst_id)))

    def rows_or_dummy(rows):
        if not rows:
            return np.zeros((1, _LANES), np.float32)
        return np.stack(rows)

    return PallasScene(
        nodes_rows=jnp.asarray(nodes_rows),
        node_ifields=jnp.asarray(ifields.astype(np.int32).reshape(-1)),
        tri_rows=jnp.asarray(rows_or_dummy(tri_rows)),
        sph_rows=jnp.asarray(rows_or_dummy(sph_rows)),
        meta=tuple(meta),
        leaf_width=int(max_count[0]),
        needs_bary=_scene_needs_bary(scene),
    )


def _scene_needs_bary(scene: SceneData) -> bool:
    """True when any triangle material samples a diffuse texture or the
    scene has alpha cutouts -- the only consumers of hit barycentrics
    (shade_hits UV interpolation, traverse.py:445-450; alpha map_d tests,
    ops/alpha.py)."""
    if bool(scene.has_alpha):
        return True
    tri_mat = np.asarray(scene.tri_mat)
    if tri_mat.size == 0:
        return False
    dtex = np.asarray(scene.mat_diffuse_tex)
    if dtex.size == 0:
        return False
    used = dtex[np.clip(tri_mat, 0, dtex.shape[0] - 1)]
    return bool((used >= 0).any())


def _cell(row, lane: int):
    """Static scalar extraction from a (1,128) fetched row.

    Returns a 0-d value: scalar-x-vector arithmetic splats natively in
    Mosaic, whereas a (1,1)->(TR,128) vector broadcast is "broadcast in both
    sublanes and lanes" and unimplemented."""
    return row[0, lane]


def _vcell(row, lane: int, rows: int):
    """Vector broadcast of one row lane to a (rows, 128) tile.

    Two supported Mosaic ops (lane broadcast, then sublane repeat) -- stays
    entirely on the vector unit, avoiding the vector->scalar move latency of
    `_cell` when the value is only consumed by lane arithmetic (~+12%
    end-to-end on the packet kernel)."""
    lane_bc = jnp.broadcast_to(row[0:1, lane : lane + 1], (1, _LANES))
    if rows == 1:
        return lane_bc
    return pltpu.repeat(lane_bc, rows, axis=0)


def _slab(row, ox, oy, oz, ix, iy, iz, t_min, t_max):
    """AABB slab test of all lanes vs the node row (bounds in lanes 0..5)."""
    rows = ox.shape[0]
    bmin_x, bmin_y, bmin_z = (_vcell(row, k, rows) for k in range(3))
    bmax_x, bmax_y, bmax_z = (_vcell(row, k, rows) for k in range(3, 6))
    t1 = (bmin_x - ox) * ix
    t2 = (bmax_x - ox) * ix
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    t1 = (bmin_y - oy) * iy
    t2 = (bmax_y - oy) * iy
    lo = jnp.maximum(lo, jnp.minimum(t1, t2))
    hi = jnp.minimum(hi, jnp.maximum(t1, t2))
    t1 = (bmin_z - oz) * iz
    t2 = (bmax_z - oz) * iz
    lo = jnp.maximum(lo, jnp.minimum(t1, t2))
    hi = jnp.minimum(hi, jnp.maximum(t1, t2))
    return (hi >= jnp.maximum(lo, t_min)) & (lo <= t_max)


def _inv(d):
    return 1.0 / jnp.where(d != 0.0, d, 1e-8)


def _transform(w2o, ox, oy, oz, dx, dy, dz):
    m = [float(v) for v in w2o]
    o2x = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    o2y = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    o2z = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    d2x = m[0] * dx + m[1] * dy + m[2] * dz
    d2y = m[4] * dx + m[5] * dy + m[6] * dz
    d2z = m[8] * dx + m[9] * dy + m[10] * dz
    return o2x, o2y, o2z, d2x, d2y, d2z


def _is_identity(w2o) -> bool:
    ident = (1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
    return all(abs(a - b) < 1e-12 for a, b in zip(w2o, ident))


def _leaf_tri_test(leaf_row, count, ox, oy, oz, dx, dy, dz, t_best, prim_best,
                   bu_best, bv_best, leaf_width: int = LEAF_WIDTH):
    """MT-test the <=leaf_width packed triangles in leaf_row vs all lanes."""
    rows = ox.shape[0]
    for j in range(leaf_width):
        base = j * TRI_STRIDE
        v0x, v0y, v0z = (_vcell(leaf_row, base + k, rows) for k in range(3))
        e1x, e1y, e1z = (_vcell(leaf_row, base + 3 + k, rows) for k in range(3))
        e2x, e2y, e2z = (_vcell(leaf_row, base + 6 + k, rows) for k in range(3))
        prim_bits = _vcell(leaf_row, base + 9, rows)

        # p = cross(d, e2)
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
        ok = ok & (j < count)  # scalar broadcast
        prim = prim_bits.astype(jnp.int32)  # stored as exact float id
        t_best = jnp.where(ok, t, t_best)
        prim_best = jnp.where(ok, prim, prim_best)
        bu_best = jnp.where(ok, bu, bu_best)
        bv_best = jnp.where(ok, bv, bv_best)
    return t_best, prim_best, bu_best, bv_best


def _leaf_sph_test(leaf_row, count, ox, oy, oz, dx, dy, dz, t_best, prim_best,
                   leaf_width: int = LEAF_WIDTH):
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
        prim = prim_bits.astype(jnp.int32)  # stored as exact float id
        t_best = jnp.where(ok, t, t_best)
        prim_best = jnp.where(ok, prim, prim_best)
    return t_best, prim_best


def _make_kernel(meta, any_hit: bool):
    """Build the kernel body for a static instance list."""

    def kernel(ifl_ref, nodes_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, prim_ref, inst_ref, bu_ref, bv_ref):
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

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
            # world-space instance AABB early-out on the world ray
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
            cur0 = jax.lax.select(jnp.any(enter), jnp.int32(root), jnp.int32(-1))

            def cond(c):
                return c[0] >= 0

            def body(c):
                cur, t_b, p_b, bu_b, bv_b = c
                row = nodes_ref[pl.ds(cur, 1), :]
                mask = _slab(row, ox, oy, oz, ix, iy, iz, T_EPS, t_b)
                left = ifl_ref[cur * 4]
                first = ifl_ref[cur * 4 + 1]
                count = ifl_ref[cur * 4 + 2]
                skip = ifl_ref[cur * 4 + 3]
                is_leaf = count > 0
                hit_any = jnp.any(mask)

                def do_leaf(args):
                    t_b, p_b, bu_b, bv_b = args
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
                    # only lanes whose node mask passed may accept
                    upd = t_n < t_b
                    keep = mask & upd
                    return (
                        jnp.where(keep, t_n, t_b),
                        jnp.where(keep, p_n, p_b),
                        jnp.where(keep, bu_n, bu_b),
                        jnp.where(keep, bv_n, bv_b),
                    )

                t_b, p_b, bu_b, bv_b = jax.lax.cond(
                    hit_any & is_leaf, do_leaf, lambda a: a,
                    (t_b, p_b, bu_b, bv_b),
                )
                nxt = jax.lax.select(
                    hit_any, jax.lax.select(is_leaf, skip, left), skip
                )
                return nxt, t_b, p_b, bu_b, bv_b

            _, t_new, p_new, bu_new, bv_new = jax.lax.while_loop(
                cond, body, (cur0, t_best, prim_best, bu_best, bv_best)
            )
            took = (t_new < t_best) & (p_new >= 0)
            inst_best = jnp.where(took, inst_id, inst_best)
            kind_const = KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
            # kind is recoverable from inst via meta; prim distinguishes
            t_best, prim_best, bu_best, bv_best = t_new, p_new, bu_new, bv_new
            del kind_const

        if any_hit:
            t_ref[...] = t_best
            prim_ref[...] = prim_best
            inst_ref[...] = inst_best
            bu_ref[...] = bu_best
            bv_ref[...] = bv_best
        else:
            t_ref[...] = t_best
            prim_ref[...] = prim_best
            inst_ref[...] = inst_best
            bu_ref[...] = bu_best
            bv_ref[...] = bv_best

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _run_trace(pscene_arrays, meta, o, d, t_max, interpret=False):
    nodes_rows, node_ifields, tri_rows, sph_rows = pscene_arrays
    n = o.shape[0]
    tile = TILE_ROWS * _LANES
    n_pad = -(-n // tile) * tile
    g = n_pad // tile

    def comp(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(g * TILE_ROWS, _LANES)

    ox, oy, oz = (comp(o[:, k]) for k in range(3))
    dx, dy, dz = (comp(d[:, k]) for k in range(3))
    tm = comp(t_max)

    # with scalar prefetch, index maps receive (grid idx..., *scalar_refs)
    ray_spec = pl.BlockSpec(
        (TILE_ROWS, _LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_kernel(meta, any_hit=False)
    out_shape = [
        jax.ShapeDtypeStruct((g * TILE_ROWS, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((g * TILE_ROWS, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((g * TILE_ROWS, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((g * TILE_ROWS, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((g * TILE_ROWS, _LANES), jnp.float32),
    ]
    t, prim, inst, bu, bv = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[full, full, full] + [ray_spec] * 7,
            out_specs=[ray_spec] * 5,
        ),
        interpret=interpret,
    )(node_ifields, nodes_rows, tri_rows, sph_rows, ox, oy, oz, dx, dy, dz, tm)

    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(prim), flat(inst), flat(bu), flat(bv)


def trace_closest_pallas(
    pscene: PallasScene, o, d, active=None, t_max=None,
    interpret: bool | None = None,
) -> HitRecord:
    """Drop-in closest-hit trace over the packed scene.

    interpret=None auto-selects the pallas interpreter on CPU backends
    (tests / simulated meshes); real Mosaic compilation elsewhere."""
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
        pscene.nodes_rows, pscene.node_ifields, pscene.tri_rows, pscene.sph_rows
    )
    t, prim, inst, bu, bv = _run_trace(
        arrays, pscene.meta, o, d, t_max, interpret
    )
    miss = prim < 0
    kind_by_inst = {m[4]: (KIND_TRI if m[0] == BLAS_TRI_MESH else KIND_SPHERE)
                    for m in pscene.meta}
    # map inst -> kind with a small static table lookup
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


def shadow_occlusion_pallas(
    pscene: PallasScene, o, d, t_max_world, active=None,
    interpret: bool | None = None,
):
    """Any-hit via the closest-hit kernel with a finite t_max (a hit closer
    than t_max occludes). A dedicated early-exit kernel is a later
    optimization."""
    hit = trace_closest_pallas(
        pscene, o, d, active=active, t_max=t_max_world, interpret=interpret
    )
    return hit.prim >= 0
