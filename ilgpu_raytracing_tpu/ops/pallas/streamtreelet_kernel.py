"""Treelet-binned HBM-streaming traversal (round-4 pivot, BENCHLOG).

The cornell-scale treelet A/B proved the unions reduction is real (~2.9x
kernel work) but per-round fixed costs ate it at 15k tris; its recorded
conclusion pivots the machinery to the streaming regime (BASELINE config
5), where a leaf visit is an 8 KB DMA burst and flat bounce unions are
10-50x larger, so the same (cut / slab / sort / mask / rounds) scheme has
10-50x more drain work to save per fixed-cost dollar.

This module is the stream_kernel counterpart of treelet_kernel.py:

* `prepare_treelets_stream` cuts the stream scene's quantized 8-wide node
  table into <= 32 row-balanced treelets via the SHARED cut
  (treelet_kernel._cut_wide_tree) run on the DEQUANTIZED child bounds (the
  exact boxes the kernel walks); synthetic grouping nodes are quantized
  with the same outward-conservative scheme as the originals
  (stream_kernel._quantize_bounds), so results stay oracle-exact;
* `run_treelet_stream_trace` is one visit round: packet p walks exactly
  the treelets in its i32 want bitmask, draining multi-row leaves through
  the stream kernel's double-buffered DMA. Walk (_walk_segment) and leaf
  tests are stream_kernel's own -- only the entry points differ (dynamic
  per-treelet roots from SMEM instead of the static per-instance root).

v1 restriction: identity instance transforms only (the config-5 scene
class; `prepare_treelets_stream` asserts). The orchestration -- slab
phase, nearest-treelet sort, visit rounds, running t_max -- lives in
ops/treelet.py next to the VMEM variant.

Reference analog: per-thread divergent traversal over Sponza-scale
content, SceneDeviceViews.cs:30-86 + Scene.cs:654-674.
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

from ilgpu_raytracing_tpu.models.scene import BLAS_TRI_MESH
from ilgpu_raytracing_tpu.ops.intersect import T_INF
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    _LANES,
    LEAF_WIDTH,
    _inv,
    _is_identity,
)
from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import (
    _EMPTY,
    _leaf_sph_test_pp,
    _leaf_tri_test_pp,
    _packet_octant,
    _stack_bound,
    WIDTH,
)
from ilgpu_raytracing_tpu.ops.pallas.stream_kernel import (
    FRONT,
    QUEUE_CAP,
    ROWS_PER_LEAF,
    SPP_PRIM_BITS,
    SUB_ROWS,
    TILE_ROWS,
    _SQ_ENC_MASK,
    _SQ_MASK_SHIFT,
    StreamScene,
    _quantize_bounds,
    _start_dma,
    _wait_dma,
    _walk_segment,
)
from ilgpu_raytracing_tpu.ops.pallas.treelet_kernel import _cut_wide_tree


@struct.dataclass
class StreamTreeletScene:
    """StreamScene (with extended node tables) + its treelet cut."""

    sscene: StreamScene
    t_root: jnp.ndarray  # (T+1,) i32 wide node id; [T] = -1 sentinel
    t_inst: jnp.ndarray  # (T+1,) i32 inst_enc = inst_id*4 + kind
    t_bounds: jnp.ndarray  # (T, 6) f32 world-space treelet AABBs
    inst_spans: tuple = struct.field(pytree_node=False, default=())
    n_treelets: int = struct.field(pytree_node=False, default=0)
    any_spheres: bool = struct.field(pytree_node=False, default=False)


def _dequantize_children(sscene: StreamScene):
    """(n, 8, 6) f32 child boxes exactly as the kernel dequantizes them
    (lo + f32(q) * scale); EMPTY children keep zero boxes."""
    wf = np.asarray(sscene.wide_frame).reshape(-1, 6)
    wq = np.asarray(sscene.wide_qbounds).reshape(-1, 16).view(np.uint32)
    wc = np.asarray(sscene.wide_child).reshape(-1, WIDTH)
    n = wf.shape[0]
    wb = np.zeros((n, WIDTH, 6), np.float32)
    w0 = wq[:, 0::2]  # (n, 8)
    w1 = wq[:, 1::2]
    q = np.stack(
        [
            w0 & 255, (w0 >> 8) & 255, (w0 >> 16) & 255,
            (w0 >> 24) & 255, w1 & 255, (w1 >> 8) & 255,
        ],
        axis=2,
    ).astype(np.float32)  # (n, 8, 6) = qlo.xyz | qhi.xyz
    lo = wf[:, None, 0:3]
    fs = wf[:, None, 3:6]
    wb[:, :, 0:3] = lo + q[:, :, 0:3] * fs
    wb[:, :, 3:6] = lo + q[:, :, 3:6] * fs
    wb[wc == _EMPTY] = 0.0
    return wb


def prepare_treelets_stream(
    sscene: StreamScene, n_target: int = 32
) -> StreamTreeletScene:
    """Cut the stream scene into <= n_target treelets (shared cut, row
    units = packed leaf rows so DMA work balances across bins)."""
    for _kind, _wid, w2o, _wb, _inst in sscene.meta:
        assert _is_identity(w2o), (
            "stream treelet rounds v1 support identity instance transforms "
            "only (the config-5 scene class); use the flat stream kernel"
        )
    wc_all = np.asarray(sscene.wide_child).reshape(-1, WIDTH).copy()
    wb_all = _dequantize_children(sscene)
    wp_all = np.asarray(sscene.wide_perm).reshape(-1, WIDTH).copy()
    n_orig = wc_all.shape[0]

    def enc_rows(c: int) -> int:
        enc = -c - 2
        return max(1, enc % 32)

    frontier, wc_all, wb_all, wp_all = _cut_wide_tree(
        wc_all, wb_all, wp_all, sscene.meta, n_target, enc_rows
    )
    T = len(frontier)
    assert T <= 32

    # quantize ONLY the appended synthetic nodes; original rows keep their
    # bit-exact tables (requantizing dequantized boxes would drift the
    # frames -- still conservative, but pointlessly different)
    wf_orig = np.asarray(sscene.wide_frame).reshape(-1, 6)
    wq_orig = np.asarray(sscene.wide_qbounds).reshape(-1, 16)
    if wc_all.shape[0] > n_orig:
        wf_x, wq_x = _quantize_bounds(wb_all[n_orig:], wc_all[n_orig:])
        wf_all = np.concatenate([wf_orig, wf_x], axis=0)
        wq_all = np.concatenate([wq_orig, wq_x], axis=0)
    else:
        wf_all, wq_all = wf_orig, wq_orig

    spans = []
    t_root = np.full((T + 1,), -1, np.int32)
    t_inst = np.zeros((T + 1,), np.int32)
    t_bounds = np.zeros((T, 6), np.float32)
    any_spheres = False
    for k, e in enumerate(frontier):
        kind, _root, _w2o, _wbnd, inst_id = sscene.meta[e["mi"]]
        t_root[k] = e["root"]
        t_inst[k] = inst_id * 4 + (
            KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
        )
        t_bounds[k] = e["bounds"]
        if kind != BLAS_TRI_MESH:
            any_spheres = True
        if not spans or spans[-1][0] != e["mi"]:
            spans.append([e["mi"], k, k + 1])
        else:
            spans[-1][2] = k + 1

    cap = _stack_bound(wc_all, [e["root"] for e in frontier]) + WIDTH
    smem_bytes = (wf_all.size + wq_all.size + wc_all.size + wp_all.size) * 4
    assert smem_bytes < 900_000, (
        f"treelet-extended node tables need {smem_bytes} B SMEM"
    )
    sscene2 = sscene.replace(
        wide_frame=jnp.asarray(wf_all.reshape(-1)),
        wide_qbounds=jnp.asarray(wq_all.reshape(-1)),
        wide_child=jnp.asarray(wc_all.reshape(-1)),
        wide_perm=jnp.asarray(wp_all.reshape(-1).astype(np.int32)),
        stack_cap=max(sscene.stack_cap, int(cap), 64),
    )
    return StreamTreeletScene(
        sscene=sscene2,
        t_root=jnp.asarray(t_root),
        t_inst=jnp.asarray(t_inst),
        t_bounds=jnp.asarray(t_bounds),
        inst_spans=tuple(tuple(s) for s in spans),
        n_treelets=T,
        any_spheres=any_spheres,
    )


def _make_treelet_stream_kernel(n_treelets: int, tile_rows: int, front: int,
                                stack_cap: int, rows_per_leaf: int,
                                any_spheres: bool):
    """Stream closest-hit kernel over a per-packet treelet want bitmask.

    Body = stream_kernel._make_closest_kernel with the per-instance python
    loop replaced by a fori over treelet bits (roots/instance constants are
    dynamic SMEM scalars); identity transforms only, so the packet octant
    and ray registers hoist out of the treelet loop."""
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(mask_ref, troot_ref, tinst_ref,
               wc_ref, wf_ref, wq_ref, wp_ref, tri_hbm, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, pp_ref,
               stack_ref, queue_ref, buf_ref, sem):
        g = pl.program_id(0)
        shape = ox_ref.shape
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

        t_ref[...] = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        pp_ref[...] = jnp.full(shape, -1, jnp.int32)
        pkt_mask = mask_ref[g]
        ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)
        octant = _packet_octant(dx, dy, dz)

        def tl_body(tl):
            @pl.when(((pkt_mask >> tl) & 1) != 0)
            def _():
                inst_enc = tinst_ref[tl]
                inst_bits = inst_enc << SPP_PRIM_BITS
                kind = inst_enc & 3
                stack_ref[0] = troot_ref[tl]

                def sub_update(sub, leaf_row, cnt, tri: bool):
                    for s in range(n_sub):
                        @pl.when(((sub >> s) & 1) != 0)
                        def _(s=s, leaf_row=leaf_row, cnt=cnt):
                            sl = slice(s * sub_rows, (s + 1) * sub_rows)
                            t_b = t_ref[sl, :]
                            pp_b = pp_ref[sl, :]
                            test = (_leaf_tri_test_pp if tri
                                    else _leaf_sph_test_pp)
                            t_n, pp_n = test(
                                leaf_row, cnt,
                                ox[sl], oy[sl], oz[sl],
                                dx[sl], dy[sl], dz[sl],
                                t_b, pp_b, inst_bits, LEAF_WIDTH,
                            )
                            t_ref[sl, :] = t_n
                            pp_ref[sl, :] = pp_n

                def drain_tri(n_q):
                    _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                               jnp.int32(0), n_q, jnp.int32(0),
                               rows_per_leaf)

                    def leaf_body(q, carry):
                        packed = queue_ref[q]
                        sub = packed >> _SQ_MASK_SHIFT
                        enc = packed & _SQ_ENC_MASK
                        slot = q % 2
                        _wait_dma(tri_hbm, buf_ref, sem, queue_ref, q, slot,
                                  rows_per_leaf)
                        _start_dma(tri_hbm, buf_ref, sem, queue_ref,
                                   q + 1, n_q, (q + 1) % 2, rows_per_leaf)
                        n_rows = enc % 32
                        for r in range(rows_per_leaf):
                            @pl.when(r < n_rows)
                            def _(r=r, sub=sub, slot=slot):
                                leaf_row = buf_ref[slot, pl.ds(r, 1), :]
                                sub_update(sub, leaf_row,
                                           jnp.int32(LEAF_WIDTH), tri=True)
                        return carry

                    return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

                def drain_sph(n_q):
                    def leaf_body(q, carry):
                        packed = queue_ref[q]
                        sub = packed >> _SQ_MASK_SHIFT
                        first = (packed & _SQ_ENC_MASK) // 32
                        leaf_row = sph_ref[pl.ds(first, 1), :]
                        sub_update(sub, leaf_row, jnp.int32(LEAF_WIDTH),
                                   tri=False)
                        return carry

                    return lax.fori_loop(0, n_q, leaf_body, jnp.int32(0))

                def seg_cond(sp):
                    return sp > 0

                def seg_body(sp):
                    t_b = t_ref[...]
                    sp, n_q = _walk_segment(
                        wc_ref, wf_ref, wq_ref, wp_ref, stack_ref, queue_ref,
                        octant, front, sp, t_b, ox, oy, oz, ix, iy, iz,
                        None, stack_cap, n_sub,
                    )
                    if any_spheres:
                        @pl.when(kind == KIND_TRI)
                        def _():
                            drain_tri(n_q)

                        @pl.when(kind == KIND_SPHERE)
                        def _():
                            drain_sph(n_q)
                    else:
                        drain_tri(n_q)
                    return sp

                lax.while_loop(seg_cond, seg_body, jnp.int32(1))

        lax.fori_loop(
            0, n_treelets, lambda tl, c: (tl_body(tl), c)[1], jnp.int32(0)
        )

    return kernel


def _pad_tiles(x, tile_rows, n):
    tile = tile_rows * _LANES
    n_pad = -(-n // tile) * tile
    g = n_pad // tile
    return jnp.pad(x, (0, n_pad - n)).reshape(g * tile_rows, _LANES), g


@functools.partial(
    jax.jit,
    static_argnames=("n_treelets", "interpret", "tile_rows", "front",
                     "stack_cap", "rows_per_leaf", "any_spheres"),
)
def run_treelet_stream_trace(arrays, mask, o, d, t_max, n_treelets,
                             interpret=False, tile_rows=TILE_ROWS,
                             front=FRONT, stack_cap=256,
                             rows_per_leaf=ROWS_PER_LEAF,
                             any_spheres=False):
    """One treelet round over the stream tables: packet p walks exactly
    the treelets whose bits are set in mask[p]. Returns (t, pp); pp = -1
    where this round found no improvement over t_max."""
    (troot, tinst, wide_child, wide_frame, wide_qbounds, wide_perm,
     tri_rows, sph_rows) = arrays
    n = o.shape[0]
    ox, g = _pad_tiles(o[:, 0], tile_rows, n)
    oy, _ = _pad_tiles(o[:, 1], tile_rows, n)
    oz, _ = _pad_tiles(o[:, 2], tile_rows, n)
    dx, _ = _pad_tiles(d[:, 0], tile_rows, n)
    dy, _ = _pad_tiles(d[:, 1], tile_rows, n)
    dz, _ = _pad_tiles(d[:, 2], tile_rows, n)
    tm, _ = _pad_tiles(t_max, tile_rows, n)
    assert mask.shape == (g,), (mask.shape, g)

    ray_spec = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, *s: (i, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = _make_treelet_stream_kernel(
        n_treelets, tile_rows, front, stack_cap, rows_per_leaf, any_spheres
    )
    shp = (g * tile_rows, _LANES)
    res = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ] + [ray_spec] * 7,
            out_specs=[ray_spec] * 2,
            scratch_shapes=[
                pltpu.SMEM((stack_cap + 1,), jnp.int32),
                pltpu.SMEM((QUEUE_CAP + WIDTH * front + 1,), jnp.int32),
                pltpu.VMEM((2, rows_per_leaf, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(mask, troot, tinst, wide_child, wide_frame, wide_qbounds, wide_perm,
      tri_rows, sph_rows, ox, oy, oz, dx, dy, dz, tm)
    return res[0].reshape(-1)[:n], res[1].reshape(-1)[:n]


def treelet_stream_arrays(sts: StreamTreeletScene):
    s = sts.sscene
    return (sts.t_root, sts.t_inst,
            s.wide_child, s.wide_frame, s.wide_qbounds, s.wide_perm,
            s.tri_rows, s.sph_rows)
