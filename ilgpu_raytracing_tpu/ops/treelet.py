"""Treelet-binned closest-hit traversal: XLA orchestration (round 4).

Executes the roofline memo's unions-reduction (BENCHLOG.md): instead of
every 4096-lane packet draining the union of its lanes' leaf visits over
the WHOLE tree (~383 of 1944 rows on the bench bounce population), rays
are binned to treelets -- subtrees of ~1/T of the leaves -- and packets
drain only the treelets their own lanes want.

Scheme (one sort, rounds without re-sorting):

1. slab phase (XLA): entry t_lo of every ray against every treelet root
   AABB -- an (N, T) dense computation, ~2 ms at bench scale;
2. rays counting-sort ONCE by their nearest treelet id (dead lanes to a
   tail bin), so round-0 packets are treelet-pure and later rounds stay
   spatially clustered;
3. visit rounds (lax.while_loop, all in sorted order): each pending lane
   picks its nearest unvisited treelet with t_lo < t_best, packets OR
   their lanes' picks into an i32 want bitmask, and the treelet kernel
   (ops/pallas/treelet_kernel.py) walks each packet through exactly its
   mask's treelets with per-lane t_max = running t_best. Every masked
   treelet completes for every pending lane in the packet (the walk's
   node union spans all lanes), so all mask bits are marked visited for
   all pending lanes -- boundary lanes retire extra treelets for free;
4. a lane resolves when no unvisited treelet's entry t_lo beats its
   t_best -- the standard closest-hit pruning argument, applied at
   treelet granularity. One unsort of the packed (t, prim|inst) record
   at the end.

Reference analog: the per-thread divergent traversal this replaces
(SceneDeviceViews.cs:30-86, RTRay.cs:657-671); a CUDA thread's private
stack gives it per-ray traversal for free, a TPU packet design buys the
same effect by reforming packets around tree locality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ilgpu_raytracing_tpu.ops.intersect import T_EPS, T_INF
from ilgpu_raytracing_tpu.ops.pallas import treelet_kernel as tlk
from ilgpu_raytracing_tpu.ops.pallas.traverse_kernel import (
    _is_identity,
)
from ilgpu_raytracing_tpu.ops.sort import _bc, _bi, _perm_from_key

_LANES = 128


def _slab_tlo_tables(meta, inst_spans, t_bounds, o, d, t_cap):
    """(N, T) conservative entry t of each ray into each treelet's
    object-space AABB; +inf where the slab test misses or the lane is
    inactive (t_cap == 0). Same slab arithmetic as the kernel
    (_child_slab): lo clamped to T_EPS, accept hi >= lo and lo <= t_cap.
    Shared by the VMEM (TreeletScene) and stream (StreamTreeletScene)
    orchestrations -- both carry (meta, inst_spans, t_bounds) tables."""
    n = o.shape[0]
    cols = []
    for mi, start, end in inst_spans:
        kind, root, w2o, wbounds, inst_id = meta[mi]
        if _is_identity(w2o):
            oo, dd = o, d
        else:
            m = np.asarray(w2o, np.float32).reshape(3, 4)
            oo = o @ m[:, 0:3].T + m[:, 3]
            dd = d @ m[:, 0:3].T
        inv = 1.0 / jnp.where(dd != 0.0, dd, 1e-8)
        b = t_bounds[start:end]  # (S, 6)
        lo = jnp.full((n, end - start), T_EPS, jnp.float32)
        hi = jnp.full((n, end - start), jnp.inf, jnp.float32)
        for ax in range(3):
            t1 = (b[None, :, ax] - oo[:, None, ax]) * inv[:, None, ax]
            t2 = (b[None, :, 3 + ax] - oo[:, None, ax]) * inv[:, None, ax]
            lo = jnp.maximum(lo, jnp.minimum(t1, t2))
            hi = jnp.minimum(hi, jnp.maximum(t1, t2))
        ok = (hi >= lo) & (lo <= t_cap[:, None])
        cols.append(jnp.where(ok, lo, jnp.inf))
    return jnp.concatenate(cols, axis=1)


def _slab_tlo(ts: "tlk.TreeletScene", o, d, t_cap):
    return _slab_tlo_tables(
        ts.wscene.meta, ts.inst_spans, ts.t_bounds, o, d, t_cap
    )


def _pad_len(n: int, tile_rows: int) -> int:
    tile = tile_rows * _LANES
    return -(-n // tile) * tile


def trace_closest_treelet_single(
    ts: "tlk.TreeletScene", o, d, active=None, t_max=None,
    tile_rows: int = tlk.TILE_ROWS, interpret: bool | None = None,
):
    """Single-dispatch treelet trace: every lane's want mask carries ALL
    treelets whose slab entry beats its t_max (a superset of what the
    near-first rounds scheme visits -- mean 2.3 slab-hit treelets/ray on
    the bench bounce population), packets OR lanes' masks, ONE kernel
    launch walks each packet through its mask. Exact: the visited set is a
    superset of every treelet that could contain the closest hit, and the
    walk itself prunes per lane on the running t. Treelet index order is
    the cut's Morton order, so in-walk visit order is near-first-ish and
    the t tightens early.

    Vs the rounds scheme: trades slightly larger per-packet unions (each
    lane's 2nd/3rd candidates join the packet mask unconditionally) for
    zero per-round overhead -- no (N, T) argmin passes, no re-dispatch, no
    visited bookkeeping."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    T = ts.n_treelets
    assert T <= 32, "treelet want mask is one i32 (prepare with <= 32)"
    arrays = tlk.treelet_arrays(ts)
    any_spheres = any(
        not _meta_is_tri(ts.wscene.meta[mi]) for mi, _s, _e in ts.inst_spans
    )

    with jax.named_scope("glue_sortperm"):
        t_lo_u = _slab_tlo(ts, o, d, t_max)
        cmin_u = jnp.min(t_lo_u, axis=1)
        tid_u = jnp.argmin(t_lo_u, axis=1).astype(jnp.int32)
        key = jnp.where(jnp.isfinite(cmin_u), tid_u, jnp.int32(T))
        # per-lane full candidate mask rides the sort as one i32 column
        bits = jnp.where(
            jnp.isfinite(t_lo_u),
            jnp.left_shift(
                jnp.int32(1), jnp.arange(T, dtype=jnp.int32)[None, :]
            ),
            jnp.int32(0),
        ).sum(axis=1, dtype=jnp.int32)
        perm, pos = _perm_from_key(key, T + 1)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d, t_max[:, None]], axis=1)
        rs = jnp.take(rows, perm, axis=0)
        o_s, d_s, tm_s = rs[:, 0:3], rs[:, 3:6], rs[:, 6]
        # the mask moves as a separate i32 gather: riding the f32 row
        # gather as a bitcast loses low-bit patterns on TPU (denormal-range
        # payloads flush; measured 18k mismatched lanes at 1.8M). A scatter
        # formulation (sorted[pos]=rows, no perm build) was also measured
        # and is ~2x SLOWER than perm+gather per sort on v5e -- keep
        # gathers.
        bit_s = jnp.take(bits, perm, axis=0)

    n_pad = _pad_len(n, tile_rows)
    g = n_pad // (tile_rows * _LANES)
    bit_p = jnp.pad(bit_s, (0, n_pad - n)).reshape(g, tile_rows * _LANES)
    mask = lax.reduce(bit_p, np.int32(0), lax.bitwise_or, (1,))
    t_r, pp_r = tlk.run_treelet_trace(
        arrays, mask, o_s, d_s, tm_s,
        T, interpret=interpret, tile_rows=tile_rows,
        stack_cap=ts.wscene.stack_cap,
        leaf_width=ts.wscene.leaf_width,
        all_identity=ts.all_identity,
        any_spheres=any_spheres,
    )
    with jax.named_scope("glue_unsort"):
        out = jnp.concatenate([t_r[:, None], _bc(pp_r)[:, None]], axis=1)
        ro = jnp.take(out, pos, axis=0)
    return ro[:, 0], _bi(ro[:, 1])


def trace_closest_treelet_packed(
    ts: "tlk.TreeletScene", o, d, active=None, t_max=None,
    tile_rows: int = tlk.TILE_ROWS, interpret: bool | None = None,
    max_rounds: int | None = None, with_rounds: bool = False,
    cleanup_after: int | None = None,
):
    """Packed (t, pp) closest trace via treelet rounds, original lane
    order. Miss/inactive semantics match trace_closest_wide_packed.

    ``cleanup_after=k``: run k near-first treelet rounds (the dense bulk:
    round 0 alone carries most drains), then resolve the scattered pending
    tail with ONE flat wide-kernel dispatch at per-lane t_max = running
    t_best. Tail rounds measured ~30 ms each on v5e because pending lanes
    scatter over every packet (BENCHLOG round-4 ladder); the flat cleanup
    walk is cheap instead -- resolved lanes carry t_max=0 and pending
    lanes' tight t_best collapses its unions. Exact either way.

    ``max_rounds`` caps the visit loop (diagnostic only -- results are
    INCOMPLETE if the cap fires); ``with_rounds`` additionally returns the
    executed round count."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    T = ts.n_treelets
    assert T <= 32, "treelet want mask is one i32 (prepare with <= 32)"
    arrays = tlk.treelet_arrays(ts)
    any_spheres = any(
        not _meta_is_tri(ts.wscene.meta[mi]) for mi, _s, _e in ts.inst_spans
    )

    with jax.named_scope("glue_sortperm"):
        # sort key: nearest treelet by slab entry (dead/no-hit lanes to the
        # tail bin T); stability keeps the caller's spatial order as the
        # secondary key inside each treelet bucket
        t_lo_u = _slab_tlo(ts, o, d, t_max)
        cmin_u = jnp.min(t_lo_u, axis=1)
        tid_u = jnp.argmin(t_lo_u, axis=1).astype(jnp.int32)
        key = jnp.where(jnp.isfinite(cmin_u), tid_u, jnp.int32(T))
        perm, pos = _perm_from_key(key, T + 1)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d, t_max[:, None]], axis=1)
        rs = jnp.take(rows, perm, axis=0)
        o_s, d_s, tm_s = rs[:, 0:3], rs[:, 3:6], rs[:, 6]

    # sorted-domain slab (recomputed: ~2 ms, cheaper than gathering the
    # (N, T) matrix through the permutation)
    t_lo = _slab_tlo(ts, o_s, d_s, tm_s)

    n_pad = _pad_len(n, tile_rows)
    g = n_pad // (tile_rows * _LANES)
    bits_tbl = jnp.left_shift(jnp.int32(1), jnp.arange(T, dtype=jnp.int32))

    r_cap = T if max_rounds is None else min(max_rounds, T)
    if cleanup_after is not None:
        r_cap = min(r_cap, cleanup_after)

    def cond(c):
        t_best, pp_s, t_lo, it = c
        return (it < r_cap) & jnp.any(jnp.min(t_lo, axis=1) < t_best)

    def body(c):
        t_best, pp_s, t_lo, it = c
        cand = jnp.where(t_lo < t_best[:, None], t_lo, jnp.inf)
        cmin = jnp.min(cand, axis=1)
        tid = jnp.argmin(cand, axis=1).astype(jnp.int32)
        pending = cmin < t_best
        bit = jnp.where(pending, jnp.take(bits_tbl, tid), jnp.int32(0))
        bit_p = jnp.pad(bit, (0, n_pad - n)).reshape(g, tile_rows * _LANES)
        mask = lax.reduce(
            bit_p, np.int32(0), lax.bitwise_or, (1,)
        )
        t_r, pp_r = tlk.run_treelet_trace(
            arrays, mask, o_s, d_s,
            jnp.where(pending, t_best, 0.0),
            T, interpret=interpret, tile_rows=tile_rows,
            stack_cap=ts.wscene.stack_cap,
            leaf_width=ts.wscene.leaf_width,
            all_identity=ts.all_identity,
            any_spheres=any_spheres,
        )
        improved = pp_r >= 0
        t_best = jnp.where(improved, t_r, t_best)
        pp_s = jnp.where(improved, pp_r, pp_s)
        # every masked treelet completed for every pending lane in the
        # packet -- mark them all visited (see module docstring)
        lane_mask = jnp.repeat(mask, tile_rows * _LANES)[:n]
        vis = ((lane_mask[:, None] >> jnp.arange(T, dtype=jnp.int32)[None, :])
               & 1) != 0
        t_lo = jnp.where(vis & pending[:, None], jnp.inf, t_lo)
        return t_best, pp_s, t_lo, it + 1

    t_best, pp_s, t_lo, it = lax.while_loop(
        cond, body,
        (tm_s, jnp.full((n,), -1, jnp.int32), t_lo, jnp.int32(0)),
    )

    if cleanup_after is not None and max_rounds is None:
        from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk

        pend = jnp.min(t_lo, axis=1) < t_best
        t_c, pp_c = wk.trace_closest_wide_packed(
            ts.wscene, o_s, d_s,
            t_max=jnp.where(pend, t_best, 0.0),
            interpret=interpret, tile_rows=tile_rows,
        )
        improved = pp_c >= 0
        t_best = jnp.where(improved, t_c, t_best)
        pp_s = jnp.where(improved, pp_c, pp_s)

    with jax.named_scope("glue_unsort"):
        out = jnp.concatenate([t_best[:, None], _bc(pp_s)[:, None]], axis=1)
        ro = jnp.take(out, pos, axis=0)
    if with_rounds:
        return ro[:, 0], _bi(ro[:, 1]), it
    return ro[:, 0], _bi(ro[:, 1])


def _meta_is_tri(meta_entry) -> bool:
    from ilgpu_raytracing_tpu.models.scene import BLAS_TRI_MESH

    return meta_entry[0] == BLAS_TRI_MESH


def trace_closest_treelet_stream_packed(
    sts, o, d, active=None, t_max=None,
    tile_rows: int | None = None, interpret: bool | None = None,
    max_rounds: int | None = None, with_rounds: bool = False,
    cleanup_after: int | None = None,
):
    """Stream-kernel treelet rounds (the round-4 pivot executed): same
    scheme as trace_closest_treelet_packed -- one nearest-treelet sort,
    near-first visit rounds with running per-lane t_best, per-packet i32
    want masks -- but each round's drains stream multi-row leaves from HBM
    through the double-buffered DMA kernel
    (ops/pallas/streamtreelet_kernel.py). `sts` comes from
    prepare_treelets_stream. Miss/inactive semantics match
    trace_closest_stream_packed; `cleanup_after=k` resolves the pending
    tail after k rounds with ONE flat stream dispatch at per-lane
    t_max = running t_best (exact either way)."""
    from ilgpu_raytracing_tpu.ops.pallas import stream_kernel as sk
    from ilgpu_raytracing_tpu.ops.pallas import streamtreelet_kernel as tlsk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile_rows is None:
        tile_rows = sk.TILE_ROWS
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), T_INF, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    T = sts.n_treelets
    assert T <= 32
    arrays = tlsk.treelet_stream_arrays(sts)
    s = sts.sscene

    def run_round(mask, o_s, d_s, tm):
        return tlsk.run_treelet_stream_trace(
            arrays, mask, o_s, d_s, tm, T, interpret=interpret,
            tile_rows=tile_rows, stack_cap=s.stack_cap,
            rows_per_leaf=s.rows_per_leaf, any_spheres=sts.any_spheres,
        )

    with jax.named_scope("glue_sortperm"):
        t_lo_u = _slab_tlo_tables(
            s.meta, sts.inst_spans, sts.t_bounds, o, d, t_max
        )
        cmin_u = jnp.min(t_lo_u, axis=1)
        tid_u = jnp.argmin(t_lo_u, axis=1).astype(jnp.int32)
        key = jnp.where(jnp.isfinite(cmin_u), tid_u, jnp.int32(T))
        perm, pos = _perm_from_key(key, T + 1)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d, t_max[:, None]], axis=1)
        rs = jnp.take(rows, perm, axis=0)
        o_s, d_s, tm_s = rs[:, 0:3], rs[:, 3:6], rs[:, 6]

    t_lo = _slab_tlo_tables(s.meta, sts.inst_spans, sts.t_bounds,
                            o_s, d_s, tm_s)

    n_pad = _pad_len(n, tile_rows)
    g = n_pad // (tile_rows * _LANES)
    bits_tbl = jnp.left_shift(jnp.int32(1), jnp.arange(T, dtype=jnp.int32))

    r_cap = T if max_rounds is None else min(max_rounds, T)
    if cleanup_after is not None:
        r_cap = min(r_cap, cleanup_after)

    def cond(c):
        t_best, pp_s, t_lo, it = c
        return (it < r_cap) & jnp.any(jnp.min(t_lo, axis=1) < t_best)

    def body(c):
        t_best, pp_s, t_lo, it = c
        cand = jnp.where(t_lo < t_best[:, None], t_lo, jnp.inf)
        cmin = jnp.min(cand, axis=1)
        tid = jnp.argmin(cand, axis=1).astype(jnp.int32)
        pending = cmin < t_best
        bit = jnp.where(pending, jnp.take(bits_tbl, tid), jnp.int32(0))
        bit_p = jnp.pad(bit, (0, n_pad - n)).reshape(g, tile_rows * _LANES)
        mask = lax.reduce(bit_p, np.int32(0), lax.bitwise_or, (1,))
        t_r, pp_r = run_round(
            mask, o_s, d_s, jnp.where(pending, t_best, 0.0)
        )
        improved = pp_r >= 0
        t_best = jnp.where(improved, t_r, t_best)
        pp_s = jnp.where(improved, pp_r, pp_s)
        lane_mask = jnp.repeat(mask, tile_rows * _LANES)[:n]
        vis = ((lane_mask[:, None] >> jnp.arange(T, dtype=jnp.int32)[None, :])
               & 1) != 0
        t_lo = jnp.where(vis & pending[:, None], jnp.inf, t_lo)
        return t_best, pp_s, t_lo, it + 1

    t_best, pp_s, t_lo, it = lax.while_loop(
        cond, body,
        (tm_s, jnp.full((n,), -1, jnp.int32), t_lo, jnp.int32(0)),
    )

    if cleanup_after is not None and max_rounds is None:
        pend = jnp.min(t_lo, axis=1) < t_best
        t_c, pp_c = sk.trace_closest_stream_packed(
            s, o_s, d_s, t_max=jnp.where(pend, t_best, 0.0),
            interpret=interpret, tile_rows=tile_rows,
        )
        improved = pp_c >= 0
        t_best = jnp.where(improved, t_c, t_best)
        pp_s = jnp.where(improved, pp_c, pp_s)

    with jax.named_scope("glue_unsort"):
        out = jnp.concatenate([t_best[:, None], _bc(pp_s)[:, None]], axis=1)
        ro = jnp.take(out, pos, axis=0)
    if with_rounds:
        return ro[:, 0], _bi(ro[:, 1]), it
    return ro[:, 0], _bi(ro[:, 1])


def trace_closest_treelet_stream(sts, o, d, active=None, t_max=None,
                                 tile_rows: int | None = None,
                                 interpret: bool | None = None):
    """HitRecord stream treelet trace (rounds + stream decode epilogue)."""
    from ilgpu_raytracing_tpu.ops.pallas.stream_kernel import (
        decode_stream_hits,
    )

    t, pp = trace_closest_treelet_stream_packed(
        sts, o, d, active=active, t_max=t_max, tile_rows=tile_rows,
        interpret=interpret,
    )
    return decode_stream_hits(sts.sscene, o, d, t, pp)


def trace_closest_treelet(ts, o, d, active=None, t_max=None,
                          tile_rows: int = tlk.TILE_ROWS,
                          interpret: bool | None = None):
    """HitRecord closest trace (treelet rounds + wide decode epilogue)."""
    from ilgpu_raytracing_tpu.ops.pallas.wide_kernel import decode_wide_hits

    t, pp = trace_closest_treelet_packed(
        ts, o, d, active=active, t_max=t_max, tile_rows=tile_rows,
        interpret=interpret,
    )
    return decode_wide_hits(ts.wscene, o, d, t, pp)
