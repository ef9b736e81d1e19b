"""Pallas counting-sort position kernel (the sort-glue hot spot).

`ops/sort.py` orders bounce/shadow rays by a small integer key before every
packet trace. The XLA formulation of the stable counting sort materializes
an (N, bins) one-hot and cumsums it along the full lane axis -- ~930 MB of
intermediate at 1.8M lanes / 129 bins, measured 23 ms per build on v5e
(tools/sortedtrace_ab.py). With ~6 sorted traces per frame that is a large
fixed tax the roofline memo attributes purely to HBM/VPU traffic on the
one-hot, not to anything intrinsic to sorting.

This kernel exploits the TPU grid's SEQUENTIAL execution: one pallas_call
walks the 1024-lane blocks TWICE (grid = 2*nb) with a (bins, 128) VMEM
scratch that persists across steps.

  pass 1 (steps 0..nb-1): per-block one-hot reduced over lanes
      accumulates running per-bin counts into scratch column 0.
  transition (step nb): global bin starts = exclusive cumsum of the
      totals along the sublane axis (log2 shift-adds of zero-concats;
      Mosaic has no cumsum primitive), stored to scratch column 1;
      column 2 (the pass-2 running prefix) resets to zero.
  pass 2 (steps nb..2nb-1): recompute the one-hot, exclusive cumsum
      along the linear lane order inside the block (lane-axis shift-adds
      within each (8,128) row plus a row-prefix fixup), add
      starts[bin] + prefix[bin], reduce over bins -> each lane's
      destination index, written densely.

Lanes ride the last two dims as (8, 128) tiles of the linear order; bins
ride the leading (untiled) axis padded to 8. Output is bit-identical to
the XLA path (stable, same tie order); tests compare exactly. The result
feeds the same at[pos].set(iota) perm scatter as before (a scatter is the
one primitive Pallas TPU cannot express better).

Parity note: pure infrastructure for the TPU wavefront design; the
reference traces per-pixel megakernels and never reorders rays
(RTRay.cs:203-325 has no sorting stage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024  # lanes per grid step (must be a multiple of 1024)
_ROWS = BLOCK // 128


def _excl_cumsum_rows(x, length, axis):
    """Exclusive cumsum by log2(length) zero-concat shift-adds (inclusive
    minus input), along a static axis whose extent is `length`."""
    acc = x
    sh = 1
    while sh < length:
        pad_shape = list(x.shape)
        pad_shape[axis] = sh
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, length - sh)
        acc = acc + jnp.concatenate(
            [jnp.zeros(pad_shape, x.dtype), acc[tuple(idx)]], axis=axis
        )
        sh *= 2
    return acc - x


def _pos_kernel(key_ref, out_ref, scratch, *, bins, bins_p, nb, rows):
    # everything stays rank-3 (Mosaic crashes on rank-1 intermediates and
    # rank-changing reshapes of small arrays); scratch columns live at
    # [:, 0:1, c:c+1]
    i = pl.program_id(0)
    key = key_ref[...]  # (1, rows, 128) i32, linear order row-major
    kbin = jax.lax.broadcasted_iota(jnp.int32, (bins_p, rows, 128), 0)
    onehot = (key == kbin).astype(jnp.int32)  # (bins_p, rows, 128)
    # a fresh reduce, NOT incl_c[:, :, 127:128]: a lane-offset slice layout
    # breaks Mosaic's concat in the row-prefix cumsum below
    row_tot = jnp.sum(onehot, axis=2, keepdims=True)  # (bins_p, rows, 1)
    counts = jnp.sum(row_tot, axis=1, keepdims=True)  # (bins_p, 1, 1)

    @pl.when(i == 0)
    def _init():
        scratch[:, :, 0:1] = jnp.zeros((bins_p, 1, 1), jnp.int32)

    @pl.when(i == nb)
    def _starts():
        tot = scratch[:, :, 0:1]
        # bins beyond `bins` only hold the padding lanes' fake key
        # (bins - 1), which never reaches here; starts for them are
        # harmless either way.
        scratch[:, :, 1:2] = _excl_cumsum_rows(tot, bins_p, axis=0)
        scratch[:, :, 2:3] = jnp.zeros((bins_p, 1, 1), jnp.int32)

    @pl.when(i < nb)
    def _pass1():
        scratch[:, :, 0:1] = scratch[:, :, 0:1] + counts
        out_ref[...] = jnp.zeros_like(key)

    @pl.when(i >= nb)
    def _pass2():
        # within-block exclusive rank over the linear (row-major) order:
        # lane-axis cumsum inside each 128-lane row + per-row prefix
        incl_c = _excl_cumsum_rows(onehot, 128, axis=2) + onehot
        row_pre = _excl_cumsum_rows(row_tot, rows, axis=1)
        within = incl_c + row_pre - onehot
        offs = scratch[:, :, 1:2] + scratch[:, :, 2:3]  # (bins_p, 1, 1)
        pos = jnp.sum(onehot * (within + offs), axis=0, keepdims=True)
        out_ref[...] = pos
        scratch[:, :, 2:3] = scratch[:, :, 2:3] + counts


@partial(jax.jit, static_argnames=("bins", "block", "interpret"))
def counting_pos(key: jnp.ndarray, bins: int, block: int = BLOCK,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Destination index of every lane under a stable counting sort of
    `key` (i32 values in [0, bins)). Bit-identical to the XLA one-hot
    formulation in ops/sort.py (`_perm_from_key`'s `pos`)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert block % 1024 == 0
    rows = block // 128
    n = key.shape[0]
    bins_p = ((bins + 7) // 8) * 8
    nb = -(-n // block)
    np_ = nb * block
    if np_ != n:
        # padded lanes take the last bin; stability puts them after every
        # real lane of that bin, so real lanes' positions are unchanged
        key = jnp.concatenate(
            [key, jnp.full((np_ - n,), bins - 1, key.dtype)]
        )
    key3d = key.reshape(nb, rows, 128)

    kern = partial(_pos_kernel, bins=bins, bins_p=bins_p, nb=nb, rows=rows)
    pos3d = pl.pallas_call(
        kern,
        grid=(2 * nb,),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda b: (b % nb, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, 128), lambda b: (b % nb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, rows, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bins_p, 1, 128), jnp.int32)],
        interpret=interpret,
    )(key3d)

    return pos3d.reshape(np_)[:n]
