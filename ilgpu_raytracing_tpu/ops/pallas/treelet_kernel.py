"""Treelet-binned packet traversal: the unions-reduction kernel (round 4).

The roofline memo (BENCHLOG.md) proves the flat packet design is at its
cost-model ceiling on incoherent bounce rays: a sorted 4096-lane packet
drains the UNION of its lanes' leaf visits (~383 of 1944 rows on the bench
scene) while each ray needs ~6 rows, and the whole-tile MT test pays for
every wasted (ray, leaf-row) pair. The only route to the memo's 19-39
Mrays/s band is fewer pairs -- an algorithmic reformation, not scheduling.

This kernel executes that reformation (reference analog: the per-thread
divergent traversal this replaces, SceneDeviceViews.cs:30-86 +
RTRay.cs:657-671, which a GPU gets for free from per-thread stacks):

* the wide BVH is cut into T treelets (frontier expansion by leaf count,
  prepare_treelets); treelet roots are synthetic-wrapped so every root is
  an inner wide node;
* the CALLER (ops/treelet.py) slab-tests every ray against every treelet
  root in XLA, sorts rays ONCE by their nearest treelet, then runs visit
  rounds entirely in sorted order: each round every packet carries an i32
  WANT BITMASK (T <= 32) of the treelets its pending lanes picked, and
  this kernel walks the packet through exactly those treelets;
* per-lane t_max carries the ray's running closest t between rounds, so
  later treelets prune against hits from earlier ones. Every treelet a
  packet walks is COMPLETE for every lane in the packet (the walk's
  node-union `any` includes all lanes and prunes per lane only on
  lo > t_best -- the standard closest-hit skip), so the caller marks all
  of a packet's mask bits visited for all its pending lanes: boundary
  lanes resolve extra treelets for free.

The walk/drain structure is wide_kernel's (FRONT-node frontier, octant
ordering, subtile-gated drain, packed two-ref hit record); the difference
is that roots, instance constants and world->object transforms are DYNAMIC
per-treelet scalars from SMEM instead of static python constants, because
one launch serves whatever treelet mix the sort produced.
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
from ilgpu_raytracing_tpu.ops.intersect import T_EPS, T_INF
from ilgpu_raytracing_tpu.ops.traverse import KIND_SPHERE, KIND_TRI
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import _inv, _is_identity
from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import (
    _EMPTY,
    _Q_MASK_SHIFT,
    PP_PRIM_BITS,
    QUEUE_CAP,
    SUB_ROWS,
    WIDTH,
    WideScene,
    _child_slab,
    _leaf_sph_test_pp,
    _leaf_tri_test_pp,
    _octant_perms,
    _packet_octant,
)

TILE_ROWS = 32
_LANES = 128
FRONT = 4
DRAIN_UNROLL = 4


@struct.dataclass
class TreeletScene:
    """WideScene + a treelet cut of its instances' subtrees.

    Index T (the last entry of the root/inst/w2o tables) is the DEAD
    sentinel: resolved/pad lanes sort into bucket T and its root is -1,
    which the kernel's treelet loop skips."""

    wscene: WideScene
    t_root: jnp.ndarray  # (T+1,) i32 wide node id; [T] = -1 sentinel
    t_inst: jnp.ndarray  # (T+1,) i32 inst_enc = inst_id*4 + kind
    t_w2o: jnp.ndarray  # ((T+1)*12,) f32 world->object affines
    t_bounds: jnp.ndarray  # (T, 6) f32 OBJECT-space treelet AABBs
    t_inst_idx: jnp.ndarray  # (T,) i32 index into meta order (slab phase)
    # static (meta_index, first_treelet, end_treelet) spans: treelets are
    # grouped by instance so the slab phase transforms rays once per
    # instance and slices that instance's treelet columns
    inst_spans: tuple = struct.field(pytree_node=False, default=())
    n_treelets: int = struct.field(pytree_node=False, default=0)
    # True when every instance transform is identity: the kernel then
    # compiles without the dynamic per-treelet ray transform (most scenes;
    # keeps bit-exactness with the wide kernel's static-identity path)
    all_identity: bool = struct.field(pytree_node=False, default=True)


def prepare_treelets(wscene: WideScene, n_target: int = 32) -> TreeletScene:
    """Cut every instance's wide subtree into ~n_target treelets total.

    Frontier expansion: repeatedly split the treelet with the most leaf
    rows into its wide children. Leaf children are wrapped in synthetic
    single-child wide nodes so every treelet root is walkable. The treelet
    list is ordered by instance (slab phase groups columns per instance).
    """
    wc_all = np.asarray(wscene.wide_child).reshape(-1, WIDTH).copy()
    wb_all = np.asarray(wscene.wide_bounds).reshape(-1, WIDTH, 6).copy()
    wp_all = np.asarray(wscene.wide_perm).reshape(-1, WIDTH).copy()

    frontier, wc_all, wb_all, wp_all = _cut_wide_tree(
        wc_all, wb_all, wp_all, wscene.meta, n_target, lambda c: 1
    )

    T = len(frontier)
    spans = []
    for k, e in enumerate(frontier):
        if not spans or spans[-1][0] != e["mi"]:
            spans.append([e["mi"], k, k + 1])
        else:
            spans[-1][2] = k + 1
    t_root = np.full((T + 1,), -1, np.int32)
    t_inst = np.zeros((T + 1,), np.int32)
    t_w2o = np.tile(
        np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], np.float32), T + 1
    ).reshape(T + 1, 12)
    t_bounds = np.zeros((T, 6), np.float32)
    t_inst_idx = np.zeros((T,), np.int32)
    all_identity = True
    for k, e in enumerate(frontier):
        kind, _root, w2o, _wb, inst_id = wscene.meta[e["mi"]]
        t_root[k] = e["root"]
        t_inst[k] = inst_id * 4 + (
            KIND_TRI if kind == BLAS_TRI_MESH else KIND_SPHERE
        )
        t_w2o[k] = np.asarray(w2o, np.float32)
        t_bounds[k] = e["bounds"]
        t_inst_idx[k] = e["mi"]
        if not _is_identity(w2o):
            all_identity = False

    # synthetic nesting can deepen the walk; re-derive the SMEM stack bound
    # from the actual treelet roots on the extended table
    from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import _stack_bound

    cap = _stack_bound(wc_all, [e["root"] for e in frontier]) + WIDTH
    wscene2 = wscene.replace(
        wide_child=jnp.asarray(wc_all.reshape(-1)),
        wide_bounds=jnp.asarray(wb_all.reshape(-1)),
        wide_perm=jnp.asarray(wp_all.reshape(-1).astype(np.int32)),
        stack_cap=max(wscene.stack_cap, int(cap), 64),
    )
    return TreeletScene(
        wscene=wscene2,
        t_root=jnp.asarray(t_root),
        t_inst=jnp.asarray(t_inst),
        t_w2o=jnp.asarray(t_w2o.reshape(-1)),
        t_bounds=jnp.asarray(t_bounds),
        t_inst_idx=jnp.asarray(t_inst_idx),
        inst_spans=tuple(tuple(s) for s in spans),
        n_treelets=T,
        all_identity=all_identity,
    )


def _cut_wide_tree(wc_all, wb_all, wp_all, meta, n_target, enc_rows):
    """Shared treelet cut over an 8-wide child table (VMEM wide kernel and
    HBM stream kernel differ only in leaf encoding density: `enc_rows`
    maps a leaf child encoding to its packed row count). Returns
    (frontier entries, extended wc/wb/wp) with synthetic grouping nodes
    appended; `wb_all` rows for synthetics carry exact f32 bounds (the
    stream caller re-quantizes just those rows)."""
    n_wide = wc_all.shape[0]
    sub_rows = np.zeros(n_wide, np.int64)

    def count_rows(w):
        # iterative post-order leaf-row count per wide subtree
        stack = [(int(w), False)]
        while stack:
            x, done = stack.pop()
            if done:
                r = 0
                for c in wc_all[x]:
                    if c >= 0:
                        r += sub_rows[c]
                    elif c <= -2:
                        r += enc_rows(int(c))
                sub_rows[x] = max(r, 1)
                continue
            if sub_rows[x]:
                continue
            stack.append((x, True))
            for c in wc_all[x]:
                if c >= 0 and not sub_rows[c]:
                    stack.append((int(c), False))

    def node_bounds(w):
        live = wc_all[w] != _EMPTY
        bs = wb_all[w][live]
        if not live.any():
            return np.zeros(6, np.float32)
        return np.concatenate([bs[:, 0:3].min(0), bs[:, 3:6].max(0)])

    # synthetic wide nodes: leaf children of a split regroup under one
    # node, and bin-packing later groups several fine subtrees under
    # nested synthetics -- both so a treelet root is always walkable
    extra_wc: list[np.ndarray] = []
    extra_wb: list[np.ndarray] = []

    def synth_node(children: list[tuple[int, np.ndarray]]) -> int:
        """New wide node over up to WIDTH (child_enc, bounds6) pairs."""
        assert 1 <= len(children) <= WIDTH
        wid = n_wide + len(extra_wc)
        wc = np.full((WIDTH,), _EMPTY, np.int32)
        wb = np.zeros((WIDTH, 6), np.float32)
        for i, (e, b) in enumerate(children):
            wc[i] = e
            wb[i] = b
        extra_wc.append(wc)
        extra_wb.append(wb)
        return wid

    # ---- phase 1: FINE cut (no slot budget) -- split the largest fine
    # subtree until everything is near total/(4*n_target) rows, so the
    # bin-packing below can balance bins to ~total/n_target each
    fine: list[dict] = []
    total_rows = 0
    for mi, (kind, root, w2o, wbounds, inst_id) in enumerate(meta):
        count_rows(root)
        fine.append(dict(
            root=int(root), rows=int(sub_rows[root]), mi=mi,
            bounds=node_bounds(root), splittable=True,
        ))
        total_rows += int(sub_rows[root])
    fine_goal = max(1, total_rows // max(4 * n_target, 1))
    while len(fine) < 64 * n_target:
        cand = None
        for e in sorted(fine, key=lambda x: -x["rows"]):
            if not e["splittable"] or e["rows"] <= fine_goal:
                break
            if e["root"] < n_wide:
                cand = e
                break
            e["splittable"] = False
        if cand is None:
            break
        w = cand["root"]
        fine.remove(cand)
        inner = [int(c) for c in wc_all[w] if c >= 0]
        leaf_ci = [ci for ci in range(WIDTH) if wc_all[w][ci] <= -2]
        for c in inner:
            fine.append(dict(
                root=c, rows=int(sub_rows[c]), mi=cand["mi"],
                bounds=node_bounds(c), splittable=True,
            ))
        if leaf_ci:
            kids = [(int(wc_all[w][ci]), wb_all[w][ci].copy())
                    for ci in leaf_ci]
            bb = np.stack([b for _e, b in kids])
            fine.append(dict(
                root=synth_node(kids),
                rows=sum(enc_rows(e) for e, _b in kids), mi=cand["mi"],
                bounds=np.concatenate([bb[:, 0:3].min(0), bb[:, 3:6].max(0)]),
                splittable=False,
            ))
        if not inner and not leaf_ci:
            break  # defensive: nothing to split into

    # ---- phase 2: Morton-order fine subtrees within each instance so
    # contiguous bins stay spatially tight (a packet visiting a bin drains
    # the union of whatever the bin contains)
    def morton10(c):
        q = np.clip(c * 1023.0, 0, 1023).astype(np.uint32)
        out = np.uint32(0)
        for b in range(10):
            out |= ((q[0] >> b) & 1) << (3 * b + 2)
            out |= ((q[1] >> b) & 1) << (3 * b + 1)
            out |= ((q[2] >> b) & 1) << (3 * b)
        return int(out)

    by_mi: dict[int, list[dict]] = {}
    for e in fine:
        by_mi.setdefault(e["mi"], []).append(e)
    for mi, es in by_mi.items():
        cents = np.stack([
            (e["bounds"][0:3] + e["bounds"][3:6]) * 0.5 for e in es
        ])
        lo = cents.min(0)
        ext = np.maximum(cents.max(0) - lo, 1e-12)
        keys = [morton10((c - lo) / ext) for c in cents]
        by_mi[mi] = [e for _k, e in sorted(zip(keys, es),
                                           key=lambda p: p[0])]

    # ---- phase 3: contiguous row-balanced bins (<= n_target total),
    # never spanning instances; widen the goal until the bins fit
    goal = max(1, -(-total_rows // max(n_target, 1)))
    while True:
        bins: list[list[dict]] = []
        for mi in sorted(by_mi):
            cur: list[dict] = []
            cur_rows = 0
            for e in by_mi[mi]:
                if cur and cur_rows + e["rows"] > goal:
                    bins.append(cur)
                    cur, cur_rows = [], 0
                cur.append(e)
                cur_rows += e["rows"]
            if cur:
                bins.append(cur)
        if len(bins) <= n_target:
            break
        goal = max(goal + 1, int(goal * 1.15))

    # ---- phase 4: one walkable root per bin (nest synthetics 8-wide)
    def bin_root(entries: list[dict]) -> tuple[int, np.ndarray]:
        items = [(e["root"], e["bounds"]) for e in entries]
        while len(items) > 1:
            nxt = []
            for i in range(0, len(items), WIDTH):
                grp = items[i:i + WIDTH]
                if len(grp) == 1:
                    nxt.append(grp[0])
                    continue
                bb = np.stack([b for _e, b in grp])
                nxt.append((
                    synth_node(grp),
                    np.concatenate([bb[:, 0:3].min(0), bb[:, 3:6].max(0)]),
                ))
            items = nxt
        return items[0]

    frontier = []
    for b in bins:
        root, bounds = bin_root(b)
        frontier.append(dict(
            root=root, rows=sum(e["rows"] for e in b), mi=b[0]["mi"],
            bounds=bounds,
        ))
    frontier.sort(key=lambda e: e["mi"])

    if extra_wc:
        wc_all = np.concatenate([wc_all, np.stack(extra_wc)], axis=0)
        wb_all = np.concatenate([wb_all, np.stack(extra_wb)], axis=0)
        perms_extra = np.stack([
            _octant_perms(wb_all[n_wide + i], wc_all[n_wide + i])
            for i in range(len(extra_wc))
        ])
        wp_all = np.concatenate([wp_all, perms_extra], axis=0)

    return frontier, wc_all, wb_all, wp_all


def _dyn_transform(w2o_ref, base, ox, oy, oz, dx, dy, dz):
    """_transform with 12 dynamic SMEM scalars instead of static floats."""
    m = [w2o_ref[base + k] for k in range(12)]
    o2x = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    o2y = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    o2z = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    d2x = m[0] * dx + m[1] * dy + m[2] * dz
    d2y = m[4] * dx + m[5] * dy + m[6] * dz
    d2z = m[8] * dx + m[9] * dy + m[10] * dz
    return o2x, o2y, o2z, d2x, d2y, d2z


def _make_treelet_kernel(n_treelets: int, tile_rows: int, front: int,
                         stack_cap: int,
                         leaf_width: int, all_identity: bool,
                         any_spheres: bool,
                         drain_unroll: int = DRAIN_UNROLL):
    """Closest-hit kernel over a per-packet treelet WANT BITMASK.

    Scalar-prefetch operands: per-packet mask, treelet root/inst/w2o
    tables, then the wide node tables. The walk/drain bodies mirror
    wide_kernel._make_closest_kernel; roots and instance constants are
    dynamic scalars."""
    n_sub = tile_rows // SUB_ROWS if tile_rows % SUB_ROWS == 0 else 1
    sub_rows = tile_rows // n_sub

    def kernel(mask_ref, troot_ref, tinst_ref, tw2o_ref,
               wc_ref, wb_ref, wp_ref, tri_ref, sph_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_ref, pp_ref, stack_ref, queue_ref):
        g = pl.program_id(0)
        shape = ox_ref.shape
        wox, woy, woz = ox_ref[...], oy_ref[...], oz_ref[...]
        wdx, wdy, wdz = dx_ref[...], dy_ref[...], dz_ref[...]
        t_limit = tmax_ref[...]

        t_ref[...] = jnp.minimum(jnp.full(shape, T_INF, jnp.float32), t_limit)
        pp_ref[...] = jnp.full(shape, -1, jnp.int32)
        pkt_mask = mask_ref[g]
        if all_identity:
            # octant is an ordering heuristic from the packet's first lane;
            # with identity transforms it is treelet-invariant -- hoist its
            # ~1.3 us vector->scalar sync out of the treelet loop
            octant0 = _packet_octant(wdx, wdy, wdz)

        def tl_body(tl):
            root = troot_ref[tl]

            @pl.when(((pkt_mask >> tl) & 1) != 0)
            def _():
                inst_enc = tinst_ref[tl]
                inst_bits = inst_enc << PP_PRIM_BITS
                kind = inst_enc & 3
                if all_identity:
                    ox, oy, oz, dx, dy, dz = wox, woy, woz, wdx, wdy, wdz
                    octant = octant0
                else:
                    ox, oy, oz, dx, dy, dz = _dyn_transform(
                        tw2o_ref, tl * 12, wox, woy, woz, wdx, wdy, wdz
                    )
                    octant = _packet_octant(dx, dy, dz)
                ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)
                stack_ref[0] = root

                def drain(n_q, tri: bool):
                    def leaf_body(qq, carry):
                        q0 = qq * drain_unroll
                        loaded = []
                        for u in range(drain_unroll):
                            qi = q0 + u
                            valid = qi < n_q
                            packed = queue_ref[jax.lax.select(
                                valid, qi,
                                jnp.int32(QUEUE_CAP + WIDTH * front),
                            )]
                            packed = jax.lax.select(
                                valid, packed, jnp.int32(0)
                            )
                            sub = packed >> _Q_MASK_SHIFT
                            enc = packed & ((1 << _Q_MASK_SHIFT) - 1)
                            first = enc >> 4
                            count = enc & 15
                            if tri:
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
                                test = (_leaf_tri_test_pp if tri
                                        else _leaf_sph_test_pp)
                                t_n, pp_n = test(
                                    leaf_row, count,
                                    ox[sl], oy[sl], oz[sl],
                                    dx[sl], dy[sl], dz[sl],
                                    t_b, pp_b, inst_bits, leaf_width,
                                )
                                t_ref[sl, :] = t_n
                                pp_ref[sl, :] = pp_n
                        return carry

                    n_grp = (n_q + drain_unroll - 1) // drain_unroll
                    lax.fori_loop(0, n_grp, leaf_body, jnp.int32(0))

                def walk_segment(sp, t_b):
                    def walk_cond(w):
                        return (w[0] > 0) & (w[1] < QUEUE_CAP)

                    def walk_body(w):
                        sp, n_q = w
                        popped = []
                        for _ in range(front):
                            has = sp > 0
                            sp = sp - jax.lax.select(has, 1, 0)
                            wid = stack_ref[jax.lax.select(
                                has, sp, stack_cap
                            )]
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
                                    wb_ref, base_b + c8 * 6,
                                    ox, oy, oz, ix, iy, iz, t_b,
                                )
                                wants = [
                                    jnp.any(mask[s * sub_rows:
                                                 (s + 1) * sub_rows, :])
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
                                    do_q, n_q,
                                    jnp.int32(QUEUE_CAP + WIDTH * front),
                                )
                                submask = jnp.int32(0)
                                for s, wnt in enumerate(wants):
                                    submask = submask + jax.lax.select(
                                        wnt, jnp.int32(1 << s), jnp.int32(0)
                                    )
                                queue_ref[qslot] = (
                                    (-child - 2)
                                    + (submask << _Q_MASK_SHIFT)
                                )
                                n_q = n_q + jax.lax.select(do_q, 1, 0)
                        return sp, n_q

                    return lax.while_loop(
                        walk_cond, walk_body, (sp, jnp.int32(0))
                    )

                def seg_cond(sp):
                    return sp > 0

                def seg_body(sp):
                    sp, n_q = walk_segment(sp, t_ref[...])
                    if any_spheres:
                        @pl.when(kind == KIND_TRI)
                        def _():
                            drain(n_q, True)

                        @pl.when(kind == KIND_SPHERE)
                        def _():
                            drain(n_q, False)
                    else:
                        drain(n_q, True)
                    return sp

                lax.while_loop(seg_cond, seg_body, jnp.int32(1))

        # iterate the set bits of the packet mask; cleared bits cost only
        # the scalar test (the whole packet body is inside the pl.when)
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
                     "stack_cap", "leaf_width", "all_identity",
                     "any_spheres"),
)
def run_treelet_trace(arrays, mask, o, d, t_max, n_treelets,
                      interpret=False,
                      tile_rows=TILE_ROWS, front=FRONT, stack_cap=256,
                      leaf_width=WIDTH, all_identity=True,
                      any_spheres=False):
    """One treelet round: packet p walks exactly the treelets whose bits
    are set in mask[p]. Rays must be padded so mask covers every packet.
    Returns (t, pp): t <= t_max everywhere, pp = -1 where this round found
    no improvement."""
    (troot, tinst, tw2o, wide_child, wide_bounds, wide_perm,
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
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _make_treelet_kernel(n_treelets, tile_rows, front, stack_cap,
                                  leaf_width, all_identity, any_spheres)
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
            in_specs=[full, full] + [ray_spec] * 7,
            out_specs=[ray_spec] * 2,
            scratch_shapes=[
                pltpu.SMEM((stack_cap + 1,), jnp.int32),
                pltpu.SMEM((QUEUE_CAP + WIDTH * front + 1,), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(mask, troot, tinst, tw2o, wide_child, wide_bounds, wide_perm,
      tri_rows, sph_rows, ox, oy, oz, dx, dy, dz, tm)
    return res[0].reshape(-1)[:n], res[1].reshape(-1)[:n]


def treelet_arrays(ts: TreeletScene):
    w = ts.wscene
    return (ts.t_root, ts.t_inst, ts.t_w2o,
            w.wide_child, w.wide_bounds, w.wide_perm,
            w.tri_rows, w.sph_rows)
