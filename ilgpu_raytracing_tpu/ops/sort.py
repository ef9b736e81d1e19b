"""Bounce-ray reordering for packet coherence.

Packet traversal throughput depends on how similar the rays inside a tile
are: an incoherent tile's node-visit union approaches the whole tree, at
which point traversal degenerates to brute force (the "ray sorting /
compaction" capability of BASELINE config 5). Primary rays are already
coherent through the static block-linear layout (ops/layout.py); scatter
and shadow rays are not -- their directions are sampled per lane.

Measured on v5e (cornell 15.5k tris, 901k cosine-scatter rays): packets
ordered by (alive, direction octant, screen block) trace 1.8x faster than
block order alone, while ordering by (block, octant) -- octant only within
each block -- is not a win. So this module reorders rays with a STABLE
3-bit-octant + alive key: stability keeps the block-linear order as the
implicit tertiary key, dead lanes compact to the tail where whole packets
early-exit the walk.

Round-3 addition: an ORIGIN-MORTON refinement of the key. At bounce >= 1
the ray origins are scattered hit points, so even direction-sorted packets
span the whole scene and their node/leaf-visit unions stay near the tree
size (the roofline memo's unions/1 regime). Appending a few Morton bits of
the quantized ray origin below the octant groups each packet around one
scene region: measured on v5e at 1.8M lanes, bounce-2 closest 345 -> 197 ms
and mixed shadow 270 -> 135 ms (kernel-only, 2 bits/axis) -- the memo's
unions/2 band, bought with ~20 ms of extra radix-pass glue per trace.

The permutation comes from a counting sort (one-hot + cumsum --
XLA-friendly, no argsort; one 64-bin Morton pass then a stable 16-bin
alive/octant pass), and rays/hits move through ONE packed row gather each
way (row gathers are ~7x cheaper than per-field gathers on TPU, same
lesson as the ReSTIR packed reservoirs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilgpu_raytracing_tpu.ops.pallas import sortpos_kernel

_BINS = 16


def _perm_from_key(key: jnp.ndarray, bins: int = _BINS):
    """Stable counting-sort permutation for small int keys in [0, bins).

    Returns (perm, pos): sorted[i] = orig[perm[i]] and pos[i] -- each
    element's destination -- doubles as the inverse permutation
    (orig[i] = sorted[pos[i]]).

    On TPU the destinations come from the Pallas two-pass counting kernel
    (ops/pallas/sortpos_kernel.py, bit-identical, 22 -> 8 ms at 1.8M
    lanes); the XLA one-hot formulation below is the CPU path and the
    kernel's reference semantics."""
    n = key.shape[0]
    if jax.default_backend() != "cpu":
        pos = sortpos_kernel.counting_pos(key, bins)
    else:
        onehot = (
            key[:, None] == jnp.arange(bins, dtype=key.dtype)[None, :]
        )
        onehot = onehot.astype(jnp.int32)
        within = jnp.cumsum(onehot, axis=0) - onehot  # exclusive, per bin
        counts = jnp.sum(onehot, axis=0)
        starts = jnp.cumsum(counts) - counts
        # select-by-key via masked sum: a (n,16) multiply+reduce is ~10x
        # cheaper than a take_along_axis gather on TPU (measured 9.2 ->
        # ~1 ms at 901k)
        pos = jnp.sum(onehot * (within + starts[None, :]), axis=1)
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return perm, pos


def _morton4(o: jnp.ndarray, bmin, inv_ext) -> jnp.ndarray:
    """4-bit spatial code of the quantized ray origin: the scene-octant
    bits of all three axes plus the second-level bit of x (top four bits
    of the [x1 y1 z1 x0 y0 z0] Morton interleave at 2 bits/axis).

    4 bits is the measured sweet spot: 6 bits buys another ~10% of kernel
    time but forces a second counting-sort pass whose index gathers cost
    more than the kernels save (v5e, 1.8M lanes). Origins outside the
    scene bounds (e.g. sky-miss sentinel positions) clamp to the boundary
    cells."""
    q = jnp.clip(((o - bmin) * inv_ext) * 4.0, 0.0, 3.0).astype(jnp.int32)
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    return (
        ((x & 2) << 2) | ((y & 2) << 1) | (z & 2) | (x & 1)
    )


def _octant3(d):
    return (
        ((d[:, 0] > 0).astype(jnp.int32) << 2)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | (d[:, 2] > 0).astype(jnp.int32)
    )


def _ray_perm(o, d, active, morton_bounds, treelet_bounds=None):
    """(perm, pos) ordering rays by (alive, direction octant[, origin
    morton | destination treelet]). One counting-sort pass either way.

    Default refined key: octant*16+morton4 for live lanes with all dead
    lanes in one tail bin (129 bins; one-hot/cumsum cost is linear in
    bins). With `treelet_bounds` (a (T,6) world-space subtree-AABB table,
    models/bvh.cut_scene_treelets), the minor key is instead the treelet
    the ray's slab entry reaches FIRST -- destination locality, measured
    1.16x on bounce closest / 1.38x on sun shadows over origin-morton on
    the 1M-tri stream scene at equal perm-build cost (BENCHLOG round 4,
    tools/streamkey_ab.py). Live rays that miss every treelet sort into
    their own live bin just before the dead tail (ordering only -- trace
    results never depend on the key)."""
    if treelet_bounds is not None:
        t_lo = _slab_entry(treelet_bounds, o, d)
        tid = jnp.argmin(t_lo, axis=1).astype(jnp.int32)
        covered = jnp.isfinite(jnp.min(t_lo, axis=1))
        T = treelet_bounds.shape[0]
        groups = 8 * T
        key = _octant3(d) * T + tid
        key = jnp.where(covered, key, jnp.int32(groups))
        key = jnp.where(active, key, jnp.int32(groups + 1))
        return _perm_from_key(key, groups + 2)
    if morton_bounds is None:
        return _perm_from_key(octant_alive_key(d, active))
    bmin, inv_ext = morton_bounds
    key = jnp.where(
        active, _octant3(d) * 16 + _morton4(o, bmin, inv_ext),
        jnp.int32(128),
    )
    return _perm_from_key(key, 129)


def _slab_entry(bounds, o, d):
    """(N, T) slab entry t of each ray into each world-space AABB; +inf on
    miss. Sort-key arithmetic (matches ops/treelet._slab_tlo_tables with
    identity transform; approximate keys are fine, results exact)."""
    inv = 1.0 / jnp.where(d != 0.0, d, 1e-8)
    lo = jnp.full((o.shape[0], bounds.shape[0]), 1e-4, jnp.float32)
    hi = jnp.full_like(lo, jnp.inf)
    for ax in range(3):
        t1 = (bounds[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        t2 = (bounds[None, :, 3 + ax] - o[:, None, ax]) * inv[:, None, ax]
        lo = jnp.maximum(lo, jnp.minimum(t1, t2))
        hi = jnp.minimum(hi, jnp.maximum(t1, t2))
    return jnp.where(hi >= lo, lo, jnp.inf)


def octant_alive_key(d: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """4-bit key: dead lanes (bit 3) sort after all octants (bits 0-2)."""
    octant = (
        ((d[:, 0] > 0).astype(jnp.int32) << 2)
        | ((d[:, 1] > 0).astype(jnp.int32) << 1)
        | (d[:, 2] > 0).astype(jnp.int32)
    )
    return jnp.where(active, octant, jnp.int32(8))


def _bc(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _bi(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def sorted_closest(trace_fn, o, d, active, morton_bounds=None,
                   treelet_bounds=None):
    """trace_fn(o, d, active) -> HitRecord, on (alive, octant[, origin
    morton])-sorted rays, results restored to original order. One packed
    row gather each way. `morton_bounds` = (bmin, inv_ext) scene-bounds
    quantization for the Morton refinement; None keeps the octant-only
    key."""
    with jax.named_scope("glue_sortperm"):
        perm, pos, act_s = _sorted_rays(o, d, active, morton_bounds, treelet_bounds)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d], axis=1)
        rs = jnp.take(rows, perm, axis=0)
    hit = trace_fn(rs[:, 0:3], rs[:, 3:6], act_s)
    with jax.named_scope("glue_unsort"):
        out = jnp.concatenate(
            [
                hit.t[:, None], hit.bu[:, None], hit.bv[:, None],
                _bc(hit.prim)[:, None], _bc(hit.inst)[:, None],
                _bc(hit.kind)[:, None],
            ],
            axis=1,
        )
        ro = jnp.take(out, pos, axis=0)
    return hit.replace(
        t=ro[:, 0], bu=ro[:, 1], bv=ro[:, 2],
        prim=_bi(ro[:, 3]), inst=_bi(ro[:, 4]), kind=_bi(ro[:, 5]),
    )


def _sorted_rays(o, d, active, morton_bounds, treelet_bounds=None):
    """(perm, pos, sorted_active). The sort key puts every live lane
    before every dead one (dead lanes share the single tail bin and the
    counting sort is stable), so the sorted active mask is just
    iota < n_alive -- no need to carry an active column through the packed
    row gather."""
    perm, pos = _ray_perm(o, d, active, morton_bounds, treelet_bounds)
    n_alive = jnp.sum(active.astype(jnp.int32))
    act_s = jnp.arange(o.shape[0], dtype=jnp.int32) < n_alive
    return perm, pos, act_s


def sorted_closest_packed(trace_fn, decode_fn, o, d, active,
                          morton_bounds=None, treelet_bounds=None):
    """Sorted closest trace for kernels with a packed two-field hit record
    (wide/stream kernels: t + prim|inst i32, barycentrics recomputed in an
    XLA epilogue). The epilogue runs AFTER the un-permute, against the
    caller's original-order o/d, so only (N,2) rides the unsort gather
    instead of the full 6-field HitRecord -- the unsort drops from ~2/3 of
    the sorted-trace glue to ~1/4 (v5e, 1.8M lanes).

    trace_fn(o, d, active) -> (t, pp); decode_fn(t, pp) -> HitRecord in
    original lane order (close over the original o/d)."""
    with jax.named_scope("glue_sortperm"):
        perm, pos, act_s = _sorted_rays(o, d, active, morton_bounds, treelet_bounds)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d], axis=1)
        rs = jnp.take(rows, perm, axis=0)
    t, pp = trace_fn(rs[:, 0:3], rs[:, 3:6], act_s)
    with jax.named_scope("glue_unsort"):
        out = jnp.concatenate([t[:, None], _bc(pp)[:, None]], axis=1)
        ro = jnp.take(out, pos, axis=0)
    with jax.named_scope("glue_decode"):
        return decode_fn(ro[:, 0], _bi(ro[:, 1]))


def sorted_shadow(shadow_fn, o, d, active, morton_bounds=None,
                  treelet_bounds=None):
    """shadow_fn(o, d, active) -> (N,) bool, sorted like sorted_closest."""
    with jax.named_scope("glue_sortperm"):
        perm, pos, act_s = _sorted_rays(o, d, active, morton_bounds, treelet_bounds)
    with jax.named_scope("glue_sortgather"):
        rows = jnp.concatenate([o, d], axis=1)
        rs = jnp.take(rows, perm, axis=0)
    occ = shadow_fn(rs[:, 0:3], rs[:, 3:6], act_s)
    # gather as a duplicated (N,2) i32 row: XLA lowers a 1-D (N,) i32
    # gather ~1.6x slower than a 2-column row gather at 1.8M lanes
    # (measured v5e round 4: 11.1 vs 7.1 ms over the fetch floor), so
    # padding the occlusion word with a throwaway column is a net win
    # of ~4-5 ms per shadow unsort despite moving twice the bytes.
    with jax.named_scope("glue_unsort"):
        occ2 = jnp.stack([occ, occ], axis=1).astype(jnp.int32)
        return jnp.take(occ2, pos, axis=0)[:, 0] != 0
