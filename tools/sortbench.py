"""Sort-glue microbenchmark (real TPU).

Splits the cost of ops/sort.sorted_closest / sorted_shadow into its parts
at the production frame's spp-batched lane count: permutation build
(one-hot counting sort), packed row gather in, unsort gather out, and the
inverse-perm scatter. Run with the TPU idle.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, reps=10):
    import jax

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    f = jax.jit(fn)
    sync(f())
    t0 = time.time()
    for _ in range(reps):
        out = f()
    sync(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1_802_240)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.ops import sort as sort_mod

    n = args.rays
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    o = jax.random.uniform(k1, (n, 3), jnp.float32)
    d_raw = jax.random.normal(k2, (n, 3), jnp.float32)
    d = d_raw / jnp.linalg.norm(d_raw, axis=1, keepdims=True)
    active = jax.random.uniform(k3, (n,)) > 0.3
    mb = (jnp.zeros((3,), jnp.float32), jnp.ones((3,), jnp.float32))
    o, d, active = jax.device_put((o, d, active))

    perm, pos = jax.jit(
        lambda: sort_mod._ray_perm(o, d, active, mb)
    )()
    rows7 = jnp.concatenate([o, d, active.astype(jnp.float32)[:, None]], 1)
    out6 = jax.random.normal(k4, (n, 6), jnp.float32)
    out2 = out6[:, :2]
    occ = (jax.random.uniform(k4, (n,)) > 0.5).astype(jnp.int32)
    rows7, out6, out2, occ = jax.device_put((rows7, out6, out2, occ))

    items = [
        ("perm build (129-bin onehot/cumsum)",
         lambda: sort_mod._ray_perm(o, d, active, mb)),
        ("perm build (16-bin octant only)",
         lambda: sort_mod._ray_perm(o, d, active, None)),
        ("pack gather  rows[N,7] by perm",
         lambda: jnp.take(rows7, perm, axis=0)),
        ("unsort gather out[N,6] by pos",
         lambda: jnp.take(out6, pos, axis=0)),
        ("unsort gather out[N,2] by pos",
         lambda: jnp.take(out2, pos, axis=0)),
        ("unsort gather occ[N] i32 by pos",
         lambda: jnp.take(occ, pos, axis=0)),
        ("scatter at[pos].set(iota)",
         lambda: jnp.zeros((n,), jnp.int32).at[pos].set(
             jnp.arange(n, dtype=jnp.int32))),
        # transposed-layout variants: the frame's XLA graph lays the packed
        # rows out {0,1} (each field contiguous); gather along axis=1 of a
        # [7,N] array mirrors that
        ("pack gather  rowsT[7,N] axis=1",
         lambda: jnp.take(rows7.T, perm, axis=1)),
        ("unsort gather outT[6,N] axis=1",
         lambda: jnp.take(out6.T, pos, axis=1)),
        ("unsort gather outT[2,N] axis=1",
         lambda: jnp.take(out2.T, pos, axis=1)),
        ("7x single-field gathers [N]",
         lambda: [jnp.take(rows7[:, i], perm, axis=0) for i in range(7)]),
        ("starts-table take(starts129, key)",
         lambda: jnp.take(jnp.arange(129, dtype=jnp.int32),
                          jnp.clip(occ * 77, 0, 128), axis=0)),
    ]
    print(f"N = {n} lanes", flush=True)
    for name, fn in items:
        dt = timed(fn, args.reps)
        print(f"  {name:40s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
