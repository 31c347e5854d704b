"""Exactness pins for the gather-free primitives in ops/select.py.

Each helper must be bit-identical to the gather/scatter formulation it
replaces (in-range indices; out-of-range behavior as documented) —
the tracker goldens depend on these substitutions being value-exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from motcpp_tpu.ops import select


RNG = np.random.default_rng(7)


def test_take_per_row_matches_take_along_axis():
    mat = jnp.asarray(RNG.random((9, 13), dtype=np.float32))
    idx = jnp.asarray(RNG.integers(0, 13, size=(9,)).astype(np.int32))
    ref = jnp.take_along_axis(mat, idx[:, None], axis=1)[:, 0]
    got = select.take_per_row(mat, idx)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_take_per_row_out_of_range_fill():
    mat = jnp.asarray(RNG.random((4, 5), dtype=np.float32))
    idx = jnp.asarray(np.array([-1, 2, 5, 0], np.int32))
    got = np.asarray(select.take_per_row(mat, idx, fill=-3.0))
    assert got[0] == -3.0 and got[2] == -3.0
    assert got[1] == np.asarray(mat)[1, 2]


def test_take_per_row_inf_safe():
    # gated cost rows contain inf; selection must not produce NaN
    mat = jnp.full((3, 4), jnp.inf).at[:, 1].set(2.0)
    idx = jnp.asarray(np.array([1, 1, 1], np.int32))
    got = np.asarray(select.take_per_row(mat, idx))
    np.testing.assert_array_equal(got, [2.0, 2.0, 2.0])


def test_gather_rows_matches_indexing():
    tab = jnp.asarray(RNG.random((11, 6), dtype=np.float32))
    idx = jnp.asarray(RNG.integers(0, 11, size=(17,)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(tab[idx]), np.asarray(select.gather_rows(tab, idx))
    )


def test_gather_rows_batched():
    tab = jnp.asarray(RNG.random((3, 11, 6), dtype=np.float32))
    idx = jnp.asarray(RNG.integers(0, 11, size=(3, 5)).astype(np.int32))
    ref = jax.vmap(lambda t, i: t[i])(tab, idx)
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(select.gather_rows(tab, idx))
    )


def test_take_slot_matches_take_along_axis():
    ring = jnp.asarray(RNG.random((8, 5, 4), dtype=np.float32))
    slot = jnp.asarray(RNG.integers(0, 5, size=(8,)).astype(np.int32))
    ref = jnp.take_along_axis(ring, slot[:, None, None], axis=1)[:, 0, :]
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(select.take_slot(ring, slot))
    )


def test_write_slot_vector_matches_scatter():
    ring = jnp.asarray(RNG.random((8, 5, 4), dtype=np.float32))
    slot = jnp.asarray(RNG.integers(0, 5, size=(8,)).astype(np.int32))
    new = jnp.asarray(RNG.random((8, 4), dtype=np.float32))
    mask = jnp.asarray(RNG.random(8) < 0.5)
    ref = jnp.where(
        mask[:, None, None],
        ring.at[jnp.arange(8), slot].set(new),
        ring,
    )
    got = select.write_slot(ring, slot, new, mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_write_slot_scalar_matches_scatter():
    ring = jnp.asarray(RNG.integers(0, 9, size=(8, 5)).astype(np.int32))
    slot = jnp.asarray(RNG.integers(0, 5, size=(8,)).astype(np.int32))
    new = jnp.asarray(RNG.integers(0, 9, size=(8,)).astype(np.int32))
    mask = jnp.asarray(RNG.random(8) < 0.5)
    ref = jnp.where(
        mask[:, None], ring.at[jnp.arange(8), slot].set(new), ring
    )
    got = select.write_slot_scalar(ring, slot, new, mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_invert_matching_matches_scatter(seed):
    rng = np.random.default_rng(seed)
    K, N = 16, 10
    # a valid partial matching: distinct track targets
    perm = rng.permutation(K)[:N].astype(np.int32)
    d2t = np.where(rng.random(N) < 0.6, perm, -1).astype(np.int32)
    d2t_j = jnp.asarray(d2t)
    ref = (
        jnp.full((K,), -1, jnp.int32)
        .at[jnp.where(d2t_j >= 0, d2t_j, K)]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    got = select.invert_matching(d2t_j, K)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rank_match_matches_scatter_gather(seed):
    rng = np.random.default_rng(seed)
    K, N = 16, 10
    free = jnp.asarray(rng.random(K) < 0.5)
    u_det = jnp.asarray(rng.random(N) < 0.4)
    det_rank = jnp.cumsum(u_det.astype(jnp.int32)) - 1
    slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    n_new = jnp.sum(u_det.astype(jnp.int32))
    pos = (
        jnp.full((K,), N, jnp.int32)
        .at[jnp.where(u_det, det_rank, K)]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    births_ref = free & (slot_rank < n_new)
    bdet_ref = jnp.where(births_ref, pos[jnp.clip(slot_rank, 0, K - 1)], 0)
    births, bdet = select.rank_match(free, u_det)
    np.testing.assert_array_equal(np.asarray(births_ref), np.asarray(births))
    np.testing.assert_array_equal(np.asarray(bdet_ref), np.asarray(bdet))


def test_set_at_col_matches_scatter():
    mat = jnp.asarray(RNG.random((6, 9), dtype=np.float32))
    col = jnp.asarray(RNG.integers(0, 9, size=(6,)).astype(np.int32))
    ref = mat.at[jnp.arange(6), col].set(-5.0)
    got = select.set_at_col(mat, col, -5.0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
