"""Skip-index BVH builder (host, numpy).

Builds the stackless skip-index-threaded BVH the traversal contract depends
on, reproducing the reference's scheme exactly (reference Scene.cs:405-510):

* median split on the largest-extent axis, with the reference's exact
  tie-break rules;
* the RIGHT subtree is emitted before the LEFT one, so a node's left child's
  subtree can use the right child's root as its miss/skip pointer -- this is
  what makes the single `cur = hit ? (leaf ? skip-after-prims : left) : skip`
  walk visit left-then-right in depth order (Scene.cs:459-460);
* leaf prim ids are appended to a growing indirection list; `first` points
  into that list (Scene.cs:439-443).

Node int fields are packed `(left, first, count, skip)` -- the reference also
stores `right` but its traversal never reads it, so it is dropped here.

The same builder covers BLAS (leaf<=4 over prims) and TLAS (leaf<=2 over
instance world AABBs). A vectorized refit (`refit_bvh`) updates bounds
bottom-up without changing topology -- the per-frame-refit capability the
reference's RebuildPolicy advertises but never implements (BvhManager.cs:27,
SURVEY.md "known quirks").
"""

from __future__ import annotations

import sys

import numpy as np

# packed int-field column indices
LEFT, FIRST, COUNT, SKIP = 0, 1, 2, 3


def _largest_axis(ext: np.ndarray) -> int:
    """Reference axis pick (Scene.cs:447-450): x unless y/z strictly larger."""
    axis = 0
    if ext[1] > ext[0] and ext[1] >= ext[2]:
        axis = 1
    elif ext[2] > ext[0] and ext[2] >= ext[1]:
        axis = 2
    return axis


def build_skip_index_bvh(
    bmin: np.ndarray,
    bmax: np.ndarray,
    centroid: np.ndarray,
    leaf_size: int,
    method: str = "median",
    use_native: bool | None = None,
):
    """Build over P primitive AABBs.

    Returns (node_bmin (N,3) f32, node_bmax (N,3) f32, node_ifields (N,4)
    int32, leaf_order (L,) int32) where leaf_order lists local prim ids in
    leaf-emission order and node `first` indexes into leaf_order.

    method: "median" (reference parity, Scene.cs:447-456), "sah" (binned
    SAH -- better traversal quality), or "lbvh" (morton-order build --
    fastest rebuild for dynamic topology; BASELINE config 3). sah/lbvh are
    native-only and degrade to median without a toolchain.
    use_native: None = auto (native C++ builder for P >= 4096 or when
    sah/lbvh is requested, python otherwise).
    """
    P = np.asarray(bmin).shape[0]
    if use_native is None:
        use_native = method in ("sah", "lbvh") or P >= 4096
    if use_native:
        from ilgpu_raytracing_tpu import native as native_mod

        method_id = {"median": native_mod.BUILD_MEDIAN,
                     "sah": native_mod.BUILD_SAH,
                     "lbvh": native_mod.BUILD_LBVH}[method]
        out = native_mod.build_bvh(bmin, bmax, centroid, leaf_size, method_id)
        if out is not None:
            return out
        # fall through to python (no toolchain); SAH degrades to median
    return _build_skip_index_bvh_py(bmin, bmax, centroid, leaf_size)


def _build_skip_index_bvh_py(
    bmin: np.ndarray, bmax: np.ndarray, centroid: np.ndarray, leaf_size: int
):
    P = bmin.shape[0]
    assert P > 0
    bmin = np.asarray(bmin, dtype=np.float32)
    bmax = np.asarray(bmax, dtype=np.float32)
    centroid = np.asarray(centroid, dtype=np.float32)

    node_bmin: list[np.ndarray] = []
    node_bmax: list[np.ndarray] = []
    node_int: list[list[int]] = []
    leaf_order: list[np.ndarray] = []
    leaf_len = 0

    need = 2 * (P // max(1, leaf_size) + 2) * 64
    if sys.getrecursionlimit() < need:
        sys.setrecursionlimit(min(1_000_000, max(10_000, need)))

    def rec(ids: np.ndarray, parent_skip: int) -> int:
        nonlocal leaf_len
        node_i = len(node_int)
        nb_min = bmin[ids].min(axis=0)
        nb_max = bmax[ids].max(axis=0)
        node_bmin.append(nb_min)
        node_bmax.append(nb_max)
        node_int.append([-1, -1, 0, parent_skip])

        if len(ids) <= leaf_size:
            node_int[node_i][FIRST] = leaf_len
            node_int[node_i][COUNT] = len(ids)
            leaf_order.append(ids)
            leaf_len += len(ids)
            return node_i

        axis = _largest_axis(nb_max - nb_min)
        srt = ids[np.argsort(centroid[ids, axis], kind="stable")]
        mid = len(ids) >> 1
        right_root = rec(srt[mid:], parent_skip)
        left_root = rec(srt[:mid], right_root)
        node_int[node_i][LEFT] = left_root
        return node_i

    rec(np.arange(P, dtype=np.int32), -1)
    return (
        np.stack(node_bmin).astype(np.float32),
        np.stack(node_bmax).astype(np.float32),
        np.array(node_int, dtype=np.int32),
        np.concatenate(leaf_order).astype(np.int32),
    )


def refit_bvh(
    node_ifields: np.ndarray,
    leaf_order: np.ndarray,
    prim_bmin: np.ndarray,
    prim_bmax: np.ndarray,
):
    """Refit node bounds to moved primitives, keeping topology.

    Nodes are emitted parent-before-children, so a reverse sweep sees children
    before parents. Returns (node_bmin, node_bmax). Works for any tree built
    by build_skip_index_bvh. The child set of an inner node i is
    {left, left's sibling}; since right subtrees are emitted first, the right
    child root is always `i + 1` in emission order.
    """
    n = node_ifields.shape[0]
    node_bmin = np.empty((n, 3), dtype=np.float32)
    node_bmax = np.empty((n, 3), dtype=np.float32)
    for i in range(n - 1, -1, -1):
        left, first, count, _skip = node_ifields[i]
        if count > 0:
            prim_ids = leaf_order[first : first + count]
            node_bmin[i] = prim_bmin[prim_ids].min(axis=0)
            node_bmax[i] = prim_bmax[prim_ids].max(axis=0)
        else:
            right = i + 1  # right subtree emitted immediately after the node
            node_bmin[i] = np.minimum(node_bmin[left], node_bmin[right])
            node_bmax[i] = np.maximum(node_bmax[left], node_bmax[right])
    return node_bmin, node_bmax


def sphere_bounds(center: np.ndarray, radius: np.ndarray):
    r = radius[:, None]
    return center - r, center + r


def triangle_bounds(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    bmin = np.minimum(v0, np.minimum(v1, v2))
    bmax = np.maximum(v0, np.maximum(v1, v2))
    return bmin, bmax


def cut_scene_treelets(scene, n_target: int = 32) -> np.ndarray:
    """(T, 6) world-space treelet AABBs covering the whole scene, T <=
    n_target: per instance, its committed BLAS is greedily cut into
    prim-proportional subtrees (largest-by-prim-count splits first), then
    each subtree's object-space box is transformed to world space.

    Consumed as a SORT-KEY table (ops/sort.py): bounce/shadow rays bin by
    the treelet their slab entry reaches first -- destination locality,
    measured 1.16x on bounce closest / 1.38x on sun shadows over
    origin-morton at 1M tris (BENCHLOG round 4, tools/streamkey_ab.py).
    Ordering only: coverage affects packet quality, never hit results.

    Subtree spans are tracked during the descent (emission order is
    [node, RIGHT subtree, LEFT subtree], so right child spans
    [i+1, left_field) and the left child inherits the parent's end; a
    node's SKIP field is its on-miss jump target, NOT its span end)."""
    import heapq

    ifields = np.asarray(scene.blas_ifields)
    bmin_n = np.asarray(scene.blas_bmin)
    bmax_n = np.asarray(scene.blas_bmax)
    nn = ifields.shape[0]
    leaf_counts = np.where(ifields[:, 2] > 0, ifields[:, 2], 0)
    csum = np.concatenate([[0], np.cumsum(leaf_counts)])
    roots_all = sorted(int(r) for r in np.asarray(scene.inst_blas_root))
    o2w = np.asarray(scene.inst_o2w, np.float32)

    def prims(i: int, end: int) -> int:
        return int(csum[end] - csum[i])

    total = int(csum[-1])
    out = []
    for inst, root in enumerate(np.asarray(scene.inst_blas_root).tolist()):
        root = int(root)
        later = [r for r in roots_all if r > root]
        end0 = later[0] if later else nn
        share = max(1, round(n_target * prims(root, end0) / max(1, total)))
        heap = [(-prims(root, end0), root, end0)]
        while len(heap) < share:
            negp, i, end = heapq.heappop(heap)
            if ifields[i, 2] > 0:
                heapq.heappush(heap, (negp, i, end))
                break
            left = int(ifields[i, 0])
            heapq.heappush(heap, (-prims(i + 1, left), i + 1, left))
            heapq.heappush(heap, (-prims(left, end), left, end))
        m = o2w[inst]  # (3, 4)
        for _negp, i, _end in heap:
            lo, hi = bmin_n[i], bmax_n[i]
            # world box of a transformed AABB: |R| trick
            c = m[:, 0:3] @ ((lo + hi) * 0.5) + m[:, 3]
            e = np.abs(m[:, 0:3]) @ ((hi - lo) * 0.5)
            out.append(np.concatenate([c - e, c + e]))
    out = np.stack(out).astype(np.float32)
    return out[:n_target] if out.shape[0] > n_target else out
