"""LAP solver tests (model: reference tests/test_matching.cpp, plus
cross-validation of optimality against scipy and the reference's
cost-limit padding semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from motcpp_tpu.ops.lap import solve_lap, solve_lap_masked
from motcpp_tpu.ops.matching import linear_assignment


def _reference_semantics(cost: np.ndarray, thresh: float):
    """Ground truth via scipy on the reference's padded square matrix
    (reference: association/lap_solver.hpp:296-320)."""
    n, m = cost.shape
    size = n + m
    pad = np.full((size, size), thresh / 2.0, np.float64)
    pad[:n, :m] = cost
    pad[n:, m:] = 0.0
    rr, cc = linear_sum_assignment(pad)
    matches = {(int(i), int(j)) for i, j in zip(rr, cc) if i < n and j < m}
    return matches


def test_empty_threshold_cases():
    matches, ua, ub = linear_assignment(np.zeros((0, 5), np.float32), 0.5)
    assert matches == [] and ua == [] and ub == [0, 1, 2, 3, 4]


def test_single_match():
    matches, ua, ub = linear_assignment(np.array([[0.1]], np.float32), 0.5)
    assert matches == [(0, 0)] and not ua and not ub


def test_match_above_threshold_rejected():
    matches, ua, ub = linear_assignment(np.array([[0.9]], np.float32), 0.5)
    assert matches == [] and ua == [0] and ub == [0]


def test_diagonal_optimal():
    cost = np.full((3, 3), 0.9, np.float32)
    np.fill_diagonal(cost, 0.1)
    matches, ua, ub = linear_assignment(cost, 0.5)
    assert set(matches) == {(0, 0), (1, 1), (2, 2)}


def test_rectangular_both_ways():
    cost = np.array([[0.1, 0.9], [0.9, 0.1], [0.9, 0.9]], np.float32)
    matches, ua, ub = linear_assignment(cost, 0.5)
    assert set(matches) == {(0, 0), (1, 1)} and ua == [2] and not ub

    matches, ua, ub = linear_assignment(cost.T, 0.5)
    assert set(matches) == {(0, 0), (1, 1)} and not ua and ub == [2]


def test_optimality_beats_greedy():
    # greedy would take (0,0)=0.1 then force (1,0) blocked -> (1,1)=0.1;
    # classic anti-greedy case from test_matching.cpp:94-109
    cost = np.array([[0.1, 0.2], [0.3, 0.1]], np.float32)
    matches, _, _ = linear_assignment(cost, 0.5)
    assert set(matches) == {(0, 0), (1, 1)}


@pytest.mark.parametrize("shape", [(4, 4), (7, 3), (3, 7), (12, 12), (1, 9)])
@pytest.mark.parametrize("thresh", [0.3, 0.7, 1.5])
def test_matches_reference_padding_semantics(rng, shape, thresh):
    for trial in range(5):
        cost = rng.random(shape, np.float32).astype(np.float32)
        got, _, _ = linear_assignment(cost, thresh)
        want = _reference_semantics(cost.astype(np.float64), thresh)
        assert set(got) == want, f"{cost} thresh={thresh}"


def test_negative_costs(rng):
    # OC-SORT passes -(iou + angle_cost) matrices (reference:
    # src/trackers/ocsort.cpp:610-757); solver must handle negatives.
    cost = (rng.random((6, 6)) - 1.0).astype(np.float32)
    got, _, _ = linear_assignment(cost, 0.9)
    want = _reference_semantics(cost.astype(np.float64), 0.9)
    assert set(got) == want


def test_inf_entries_never_matched():
    cost = np.array([[np.inf, 0.2], [0.1, np.inf]], np.float32)
    matches, _, _ = linear_assignment(cost, 10.0)
    assert set(matches) == {(0, 1), (1, 0)}
    cost = np.array([[np.inf]], np.float32)
    matches, ua, ub = linear_assignment(cost, 10.0)
    assert matches == []


def test_masked_rows_cols_equivalent_to_slicing(rng):
    R, C = 10, 8
    cost = rng.random((R, C), np.float32).astype(np.float32)
    row_mask = np.zeros(R, bool)
    row_mask[:5] = True
    col_mask = np.zeros(C, bool)
    col_mask[:6] = True
    r2c, c2r = solve_lap_masked(
        jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask), 0.8
    )
    r2c = np.asarray(r2c)
    got = {(i, int(r2c[i])) for i in range(R) if r2c[i] >= 0}
    want = _reference_semantics(cost[:5, :6].astype(np.float64), 0.8)
    assert got == want
    # masked entities never matched
    assert all(r2c[5:] == -1)
    assert all(np.asarray(c2r)[6:] == -1)


def test_col2row_consistency(rng):
    cost = rng.random((6, 9), np.float32).astype(np.float32)
    r2c, c2r = solve_lap(jnp.asarray(cost), 0.7)
    r2c, c2r = np.asarray(r2c), np.asarray(c2r)
    for i, j in enumerate(r2c):
        if j >= 0:
            assert c2r[j] == i
    for j, i in enumerate(c2r):
        if i >= 0:
            assert r2c[i] == j


def test_vmap_over_batch(rng):
    costs = rng.random((4, 5, 5), np.float32).astype(np.float32)
    masks_r = jnp.ones((4, 5), bool)
    masks_c = jnp.ones((4, 5), bool)
    f = jax.vmap(lambda c, r, m: solve_lap_masked(c, r, m, 0.6))
    r2c, c2r = f(jnp.asarray(costs), masks_r, masks_c)
    assert r2c.shape == (4, 5)
    for b in range(4):
        want = _reference_semantics(costs[b].astype(np.float64), 0.6)
        got = {
            (i, int(r2c[b, i])) for i in range(5) if int(r2c[b, i]) >= 0
        }
        assert got == want


def test_jit_compiles_once_static_shape():
    f = jax.jit(lambda c, t: solve_lap(c, t))
    c = jnp.asarray(np.eye(4, dtype=np.float32))
    f(c, 0.5)  # compile
    out = f(c + 0.1, 0.5)
    assert out[0].shape == (4,)
