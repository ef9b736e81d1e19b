"""Ray sorting for packet coherence.

Packet traversal throughput depends on how similar the rays inside a tile
are: an incoherent tile's node-visit union approaches the whole tree. Bounce
rays are reordered by (direction octant, origin morton) before tracing and
the hits scattered back -- the "ray sorting/compaction" capability of
BASELINE config 5. Pure XLA (one sort + two gathers per trace).
"""

from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def _part1by2(x):
    """Spread 9 bits to every 3rd bit (morton interleave helper)."""
    x = x & _U(0x1FF)
    x = (x | (x << _U(16))) & _U(0x030000FF)
    x = (x | (x << _U(8))) & _U(0x0300F00F)
    x = (x | (x << _U(4))) & _U(0x030C30C3)
    x = (x | (x << _U(2))) & _U(0x09249249)
    return x


def morton3(q):
    """(N,3) uint32 coords (9 bits each) -> 27-bit morton code."""
    return (
        (_part1by2(q[:, 0]) << _U(2))
        | (_part1by2(q[:, 1]) << _U(1))
        | _part1by2(q[:, 2])
    )


def ray_sort_key(o, d, bounds_lo, bounds_hi):
    """uint32 key: 3-bit direction octant (major) + 27-bit origin morton."""
    octant = (
        ((d[:, 0] > 0).astype(jnp.uint32) << _U(2))
        | ((d[:, 1] > 0).astype(jnp.uint32) << _U(1))
        | (d[:, 2] > 0).astype(jnp.uint32)
    )
    lo = jnp.asarray(bounds_lo, jnp.float32)
    hi = jnp.asarray(bounds_hi, jnp.float32)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / span * 512.0, 0.0, 511.0).astype(jnp.uint32)
    return (octant << _U(27)) | morton3(q)


def sorted_trace(trace_fn, o, d, active, bounds_lo, bounds_hi):
    """Run trace_fn on coherence-sorted rays; returns results in original
    order. trace_fn(o, d, active) -> pytree of (N,...) arrays."""
    import jax

    key = ray_sort_key(o, d, bounds_lo, bounds_hi)
    # inactive rays go last so they pad whole tiles
    if active is not None:
        key = jnp.where(active, key, _U(0xFFFFFFFF))
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    o_s = jnp.take(o, order, axis=0)
    d_s = jnp.take(d, order, axis=0)
    a_s = None if active is None else jnp.take(active, order, axis=0)
    out = trace_fn(o_s, d_s, a_s)
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, inv, axis=0), out
    )
