"""Alpha-cutout tracing via iterative peeling around an opaque-only tracer.

The reference evaluates alpha masks INSIDE the traversal loop: closest-hit
rejects candidate triangles whose bilinear mask is below the cutoff
(SceneDeviceViews.cs:208-218), and the shadow any-hit applies a +-0.10
point/bilinear band (SceneDeviceViews.cs:297-315). Per-lane texture fetches
inside a TPU packet kernel would serialize the walk, so the TPU-native
restructure keeps the Pallas kernels alpha-free and *peels*: trace closest
with the fast kernel, evaluate the alpha predicate for the returned hits as
batched XLA texture samples (exact reference semantics via
traverse._tri_alpha_pass), and re-trace only the lanes whose closest hit was
an alpha-discarded triangle, from just past that hit. The loop runs until
every lane has an accepted hit or a miss — the same fixed point the
reference's in-loop `continue` reaches, evaluated trace-by-trace instead of
leaf-by-leaf.

Shadow rays use the same peel around the CLOSEST-hit kernel (an
alpha-discarded blocker must not occlude), applying the any-hit band
predicate to each encountered surface; occlusion latches at the first
accepted hit within t_max, identical to ShadowOcclusion's early return.

The peel advance steps the ray origin `dt = max(t*1e-4, 1e-5)` past the
discarded surface; two alpha surfaces closer than dt along the ray would be
merged (the reference has no such limit — divergence documented here).

Peel exhaustion is DEFINED and observable: a ray that crosses more than
MAX_PEELS alpha-rejected surfaces exits the loop still pending; such lanes
report a MISS for closest hits (the accept latch never fired, so the
initial t=T_INF / prim=-1 record survives) and UNOCCLUDED for shadow rays.
Pass `with_exhausted=True` to also get the per-lane exhaustion mask
(tests/test_pallas_integration.py exercises a crafted >MAX_PEELS stack).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ilgpu_raytracing_tpu.models.scene import SceneData
from ilgpu_raytracing_tpu.ops.intersect import T_INF
from ilgpu_raytracing_tpu.ops.traverse import (
    KIND_TRI,
    HitRecord,
    _tri_alpha_pass,
)

MAX_PEELS = 64


def _advance(t_hit):
    return t_hit + jnp.maximum(t_hit * 1e-4, 1e-5)


def trace_closest_peel(trace_fn, scene: SceneData, o, d, active=None,
                       with_exhausted: bool = False,
                       with_iters: bool = False):
    """Closest hit honoring alpha cutouts.

    trace_fn(o, d, active) -> HitRecord from the opaque-only tracer (t is
    world-parametric relative to the passed origin, T_INF on miss).
    with_exhausted=True returns (HitRecord, exhausted (N,) bool); exhausted
    lanes crossed >MAX_PEELS rejected surfaces and report a miss.
    with_iters=True appends the executed peel-iteration count (scalar i32,
    >= 1 when any lane was active) for perf accounting (tools/alphabench).
    """
    n = o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)

    zero = jnp.zeros((n,), jnp.float32)
    out0 = HitRecord(
        t=jnp.full((n,), T_INF, jnp.float32),
        kind=jnp.zeros((n,), jnp.int32),
        prim=jnp.full((n,), -1, jnp.int32),
        inst=jnp.full((n,), -1, jnp.int32),
        bu=zero,
        bv=zero,
    )

    def cond(s):
        i, pending, *_ = s
        return (i < MAX_PEELS) & jnp.any(pending)

    def body(s):
        i, pending, o_cur, t_base, out = s
        hit = trace_fn(o_cur, d, pending)
        is_tri = hit.kind == KIND_TRI
        opaque = _tri_alpha_pass(scene, hit.prim, hit.bu, hit.bv, closest=True)
        accept = pending & hit.hit & (opaque | (~is_tri))
        reject = pending & hit.hit & (~accept)

        keep1 = accept
        k3 = keep1
        out = HitRecord(
            t=jnp.where(keep1, t_base + hit.t, out.t),
            kind=jnp.where(keep1, hit.kind, out.kind),
            prim=jnp.where(keep1, hit.prim, out.prim),
            inst=jnp.where(keep1, hit.inst, out.inst),
            bu=jnp.where(k3, hit.bu, out.bu),
            bv=jnp.where(k3, hit.bv, out.bv),
        )
        adv = _advance(jnp.where(reject, hit.t, 0.0))
        o_cur = jnp.where(reject[..., None], o_cur + d * adv[..., None], o_cur)
        t_base = jnp.where(reject, t_base + adv, t_base)
        return i + 1, reject, o_cur, t_base, out

    i, pending, _, _, out = lax.while_loop(
        cond, body, (jnp.int32(0), active, o, zero, out0)
    )
    ret = (out,)
    if with_exhausted:
        ret = ret + (pending,)
    if with_iters:
        ret = ret + (i,)
    return ret if len(ret) > 1 else out


def shadow_occlusion_peel(trace_fn, scene: SceneData, o, d, t_max, active=None,
                          with_exhausted: bool = False,
                          with_iters: bool = False):
    """Any-hit occlusion honoring the +-0.10 alpha band (returns bool (N,)).

    trace_fn as in trace_closest_peel. `t_max` is the world-space occlusion
    range (scalar or (N,)). with_exhausted=True returns (occ, exhausted);
    exhausted lanes report unoccluded. with_iters as in trace_closest_peel.
    """
    n = o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    t_rem = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def cond(s):
        i, pending, *_ = s
        return (i < MAX_PEELS) & jnp.any(pending)

    def body(s):
        i, pending, o_cur, t_rem, occ = s
        hit = trace_fn(o_cur, d, pending)
        within = pending & hit.hit & (hit.t < t_rem)
        is_tri = hit.kind == KIND_TRI
        blocks = _tri_alpha_pass(scene, hit.prim, hit.bu, hit.bv, closest=False)
        occ_now = within & (blocks | (~is_tri))
        occ = occ | occ_now
        reject = within & (~occ_now)
        adv = _advance(jnp.where(reject, hit.t, 0.0))
        o_cur = jnp.where(reject[..., None], o_cur + d * adv[..., None], o_cur)
        t_rem = jnp.where(reject, t_rem - adv, t_rem)
        return i + 1, reject, o_cur, t_rem, occ

    i, pending, _, _, occ = lax.while_loop(
        cond, body,
        (jnp.int32(0), active, o, t_rem, jnp.zeros((n,), bool)),
    )
    ret = (occ,)
    if with_exhausted:
        ret = ret + (pending,)
    if with_iters:
        ret = ret + (i,)
    return ret if len(ret) > 1 else occ
