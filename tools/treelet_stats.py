"""Treelet packet-reformation feasibility stats (round 4, step 0).

The roofline memo (BENCHLOG.md) says the bounce-closest kernel sits at the
unions/1 ceiling and the only route to the 19-39 Mrays/s band is fewer
(ray, leaf-row) pairs — packets re-binned by tree region so each dispatch
drains only leaves its rays actually want. Before building that kernel,
this tool measures whether the premise holds on the REAL bounce population:

* cut the wide BVH into T treelets (frontier expansion by subtree size);
* for each bounce ray, slab-test every treelet root -> entry t_lo;
* trace the true hit (existing wide kernel) and map it to its treelet;
* simulate the round-based near-first visiting scheme:
    round r: each unresolved ray visits its nearest pending treelet;
    visiting the hit's treelet sets t_best = t_true; treelets with
    t_lo > t_best prune. (Optimistic only in ignoring partial t
    tightening from non-hit treelets, which would prune MORE.)

Reports: E (slab-hit treelets/ray), E_eff (treelets that must be visited
under pruning), resolution rate per round, bucket-size histogram per round
(how full the per-treelet packets are), and the implied leaf-visit totals
vs the current design's measured unions.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_cut(wscene, n_target: int):
    """Frontier expansion of each instance's wide subtree into ~n_target
    treelets, largest-leaf-count-first. Returns a list of treelet dicts:
    {root (wide id or leaf enc), inst_id, kind, w2o, bounds (6,) object
    space, leaf_rows (set of packed row ids), n_nodes}."""
    wc_all = np.asarray(wscene.wide_child).reshape(-1, 8)
    wb_all = np.asarray(wscene.wide_bounds).reshape(-1, 8, 6)

    # subtree stats per wide node (leaf rows, node count) by post-order
    n_wide = wc_all.shape[0]
    sub_rows = np.zeros(n_wide, np.int64)
    sub_nodes = np.zeros(n_wide, np.int64)

    def stats(w):
        if sub_nodes[w]:
            return
        rows = 0
        nodes = 1
        for c in wc_all[w]:
            if c >= 0:
                stats(c)
                rows += sub_rows[c]
                nodes += sub_nodes[c]
            elif c <= -2:
                rows += 1
        sub_rows[w] = rows
        sub_nodes[w] = nodes

    sys.setrecursionlimit(100000)
    for _kind, root, _w2o, _wb, _iid in wscene.meta:
        stats(root)

    def leaf_rows_of(w):
        out = set()
        stack = [w]
        while stack:
            x = stack.pop()
            for c in wc_all[x]:
                if c >= 0:
                    stack.append(c)
                elif c <= -2:
                    out.add((-c - 2) >> 4)
        return out

    def node_bounds(w):
        live = wc_all[w] != -1
        bs = wb_all[w][live]
        return np.concatenate([bs[:, 0:3].min(0), bs[:, 3:6].max(0)])

    # frontier entries: (rows, kind_of_entry, wide_id_or_enc, inst meta,
    # bounds). Leaves enter with their own slot bounds.
    frontier = []
    for kind, root, w2o, _wb, iid in wscene.meta:
        frontier.append(
            dict(root=root, is_leaf=False, inst=iid, kind=kind, w2o=w2o,
                 rows=int(sub_rows[root]), bounds=node_bounds(root))
        )
    while len(frontier) < n_target:
        # expand the inner entry with the most leaf rows
        cand = [e for e in frontier if not e["is_leaf"]]
        if not cand:
            break
        e = max(cand, key=lambda x: x["rows"])
        if e["rows"] <= 1:
            break
        frontier.remove(e)
        w = e["root"]
        for ci in range(8):
            c = wc_all[w][ci]
            if c == -1:
                continue
            if c >= 0:
                frontier.append(
                    dict(root=int(c), is_leaf=False, inst=e["inst"],
                         kind=e["kind"], w2o=e["w2o"],
                         rows=int(sub_rows[c]), bounds=node_bounds(c))
                )
            else:
                frontier.append(
                    dict(root=int(c), is_leaf=True, inst=e["inst"],
                         kind=e["kind"], w2o=e["w2o"], rows=1,
                         bounds=wb_all[w][ci].copy())
                )
    for e in frontier:
        if e["is_leaf"]:
            e["leaf_rows"] = {(-e["root"] - 2) >> 4}
        else:
            e["leaf_rows"] = leaf_rows_of(e["root"])
    return frontier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=901_120)
    ap.add_argument("--treelets", type=int, default=32)
    ap.add_argument("--leaf", type=int, default=8)
    ap.add_argument("--tile-rows", type=int, default=32)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "default"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.cornell import (
        build_cornell_scene,
        cornell_camera,
    )
    from ilgpu_raytracing_tpu.ops import rays as rays_mod
    from ilgpu_raytracing_tpu.ops import traverse
    from ilgpu_raytracing_tpu.ops.intersect import T_EPS
    from ilgpu_raytracing_tpu.ops.pallas import traverse_kernel as tk
    from ilgpu_raytracing_tpu.ops.pallas import wide_kernel as wk
    from ilgpu_raytracing_tpu.ops.sampling import sample_hemisphere_cosine
    from ilgpu_raytracing_tpu.utils import rng as rng_mod

    _, scene = build_cornell_scene(
        tess=24, sphere_tess=(48, 72), blas_leaf_size=args.leaf,
        bvh_method="sah",
    )
    w = 1280
    h = max(64, (-(-args.rays // w) // 64) * 64)
    n = w * h
    cam = cornell_camera(w, h)
    u, v = rays_mod.pixel_centers(w, h)
    o, d = rays_mod.generate_rays(cam, u, v)

    wscene = wk.prepare_wide(tk.prepare(scene))
    cut = build_cut(wscene, args.treelets)
    T = len(cut)
    rows_per = sorted(len(e["leaf_rows"]) for e in cut)
    n_rows_total = int(np.asarray(wscene.tri_rows).shape[0])
    print(f"cut: {T} treelets; leaf rows per treelet min/med/max = "
          f"{rows_per[0]}/{rows_per[len(rows_per)//2]}/{rows_per[-1]} "
          f"(scene total {n_rows_total})")

    # bounce population (same as tools/roofline.py)
    hit = wk.trace_closest_wide(wscene, o, d, tile_rows=args.tile_rows)
    surf = traverse.shade_hits(scene, hit, o, d)
    state = rng_mod.seed_from_index(
        jnp.arange(n, dtype=jnp.int32), w, np.uint32(0), np.uint32(0),
        np.uint32(0x9E3779B9), np.uint32(1),
    )
    _, scat = sample_hemisphere_cosine(surf.normal, state)
    bo = np.asarray(surf.pos + surf.normal * 1e-3)
    bd = np.asarray(scat)
    active = np.asarray(hit.hit)

    # true bounce hits
    bhit = wk.trace_closest_wide(
        wscene, jnp.asarray(bo), jnp.asarray(bd),
        active=jnp.asarray(active), tile_rows=args.tile_rows,
    )
    t_true = np.asarray(bhit.t)
    b_prim = np.asarray(bhit.prim)
    b_kind = np.asarray(bhit.kind)
    b_hit = np.asarray(bhit.hit) & active

    # prim -> packed leaf row -> treelet
    tri_rows_np = np.asarray(wscene.tri_rows)
    slot_base = np.arange(8) * tk.TRI_STRIDE
    ids = tri_rows_np[:, slot_base + 9].astype(np.int64)  # (L, 8)
    vals = tri_rows_np[:, slot_base[:, None] + np.arange(9)[None, :]]
    real = (ids != 0) | (np.abs(vals).sum(axis=-1) > 0.0)
    prim_to_row = np.full(int(ids.max()) + 1, -1, np.int64)
    rr, cc = np.nonzero(real)
    prim_to_row[ids[rr, cc]] = rr
    row_to_treelet = np.full(n_rows_total, -1, np.int64)
    for k, e in enumerate(cut):
        for r0 in e["leaf_rows"]:
            row_to_treelet[r0] = k
    hit_treelet = np.full(n, -1, np.int64)
    tri_mask = b_hit & (b_kind == 2)  # KIND_TRI
    hit_treelet[tri_mask] = row_to_treelet[prim_to_row[b_prim[tri_mask]]]

    # slab t_lo per (ray, treelet) — numpy, float32, (N, T)
    t0 = time.time()
    inv = 1.0 / np.where(np.abs(bd) < 1e-30, 1e-30, bd).astype(np.float32)
    t_lo = np.full((n, T), np.inf, np.float32)
    for k, e in enumerate(cut):
        b = e["bounds"]
        lo = np.full(n, T_EPS, np.float32)
        hi = np.full(n, np.inf, np.float32)
        for ax in range(3):
            t1 = (b[ax] - bo[:, ax]) * inv[:, ax]
            t2 = (b[3 + ax] - bo[:, ax]) * inv[:, ax]
            lo = np.maximum(lo, np.minimum(t1, t2))
            hi = np.minimum(hi, np.maximum(t1, t2))
        ok = (hi >= lo) & active
        t_lo[:, k] = np.where(ok, lo, np.inf)
    print(f"slab matrix in {time.time()-t0:.1f}s")

    E = np.isfinite(t_lo).sum(1)
    print(f"\nslab-hit treelets/ray (live lanes): mean "
          f"{E[active].mean():.2f}, p50 {np.percentile(E[active],50):.0f}, "
          f"p90 {np.percentile(E[active],90):.0f}, max {E[active].max()}")

    # round simulation
    t_best = np.where(active, np.inf, 0.0).astype(np.float32)
    # hit rays: t_best becomes t_true once the hit treelet is visited
    pend = np.isfinite(t_lo)
    visits_per_round = []
    bucket_hist = []
    leaf_rows_arr = np.array([len(e["leaf_rows"]) for e in cut])
    total_leaf_visits = 0.0
    for rnd in range(8):
        live = pend & (t_lo < t_best[:, None])
        has = live.any(1)
        if not has.any():
            break
        nearest = np.where(live, t_lo, np.inf).argmin(1)
        nearest = np.where(has, nearest, -1)
        counts = np.bincount(nearest[has], minlength=T)
        visits_per_round.append(int(has.sum()))
        bucket_hist.append(counts)
        # leaf-row visit upper bound: every bucket drains <= its treelet's rows
        total_leaf_visits += (
            (np.ceil(counts / 4096.0) * leaf_rows_arr).sum()
        )
        # visiting the hit treelet resolves the ray
        found = has & (nearest == hit_treelet)
        t_best = np.where(found, t_true, t_best)
        pend[np.arange(n)[has], nearest[has]] = False
        print(f"round {rnd}: {int(has.sum())} rays visiting; "
              f"{int(found.sum())} resolve; buckets occupied "
              f"{int((counts > 0).sum())}/{T}, "
              f"largest {counts.max()}, pad waste "
              f"{int((np.ceil(counts/4096)*4096 - counts).sum())}")
    print(f"\ntotal ray-treelet visits {sum(visits_per_round)} "
          f"({sum(visits_per_round)/max(active.sum(),1):.2f}/live ray)")
    # compare leaf-row unions: current design measured 382.8 rows / 4096-packet
    n_pkts_now = -(-n // 4096)
    print(f"leaf-row packet-visits upper bound, treelet scheme: "
          f"{int(total_leaf_visits)} vs current sorted design "
          f"{382.8 * n_pkts_now:.0f} (cornell 901k measured)")


if __name__ == "__main__":
    main()
