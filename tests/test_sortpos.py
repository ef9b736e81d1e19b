"""Pallas counting-sort position kernel vs the XLA reference formulation.

The kernel (ops/pallas/sortpos_kernel.py) must be BIT-identical to the
one-hot/cumsum counting sort in ops/sort.py: same destinations, same
stable tie order. Runs in interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilgpu_raytracing_tpu.ops import sort as sort_mod
from ilgpu_raytracing_tpu.ops.pallas import sortpos_kernel as spk


def _xla_pos(key, bins):
    onehot = (key[:, None] == jnp.arange(bins, dtype=key.dtype)[None, :])
    onehot = onehot.astype(jnp.int32)
    within = jnp.cumsum(onehot, axis=0) - onehot
    counts = jnp.sum(onehot, axis=0)
    starts = jnp.cumsum(counts) - counts
    return jnp.sum(onehot * (within + starts[None, :]), axis=1)


@pytest.mark.parametrize("bins", [16, 129])
@pytest.mark.parametrize("n", [1024, 4096, 5000])
def test_counting_pos_matches_xla(bins, n):
    rng = np.random.default_rng(n * bins)
    key = jnp.asarray(rng.integers(0, bins, size=n).astype(np.int32))
    ref = _xla_pos(key, bins)
    got = spk.counting_pos(key, bins, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_counting_pos_degenerate_keys():
    # all lanes in one bin (coherent batch) and all in the dead tail bin
    n, bins = 2048, 129
    for fill in (0, bins - 1, 7):
        key = jnp.full((n,), fill, jnp.int32)
        got = spk.counting_pos(key, bins, interpret=True)
        # stable sort of a constant key is the identity
        np.testing.assert_array_equal(
            np.asarray(got), np.arange(n, dtype=np.int32)
        )


def test_counting_pos_multiblock_stability():
    # keys repeat across blocks: within-bin order must follow lane order
    # across block boundaries (the running-prefix handoff in scratch)
    n, bins = 4096, 16
    rng = np.random.default_rng(3)
    key = jnp.asarray(rng.integers(0, bins, size=n).astype(np.int32))
    pos = np.asarray(spk.counting_pos(key, bins, interpret=True))
    keyn = np.asarray(key)
    order = np.empty(n, np.int64)
    order[pos] = np.arange(n)
    sorted_keys = keyn[order]
    assert (np.diff(sorted_keys) >= 0).all()
    for b in range(bins):
        lanes = order[sorted_keys == b]
        assert (np.diff(lanes) > 0).all(), "tie order not stable"


def test_perm_from_key_uses_identical_semantics():
    # the sort.py entry point must agree with the kernel on this backend
    n = 3000
    rng = np.random.default_rng(11)
    key = jnp.asarray(rng.integers(0, 129, size=n).astype(np.int32))
    perm, pos = sort_mod._perm_from_key(key, 129)
    ref = _xla_pos(key, 129)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(perm)[np.asarray(pos)], np.arange(n, dtype=np.int32)
    )
