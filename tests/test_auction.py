"""Auction solver tests: eps-optimality vs the exact JV solver, and
end-to-end tracker equivalence on well-separated scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.ops.auction import solve_lap_auction
from motcpp_tpu.ops.lap import solve_lap_masked


def _objective(cost, r2c, thresh):
    """Total cost of a partial matching under cost-limit economics:
    sum of matched costs + thresh per unmatched endpoint pair."""
    total = 0.0
    for i, j in enumerate(r2c):
        if j >= 0:
            total += float(cost[i, j]) - thresh
    return total


@pytest.mark.parametrize("shape", [(6, 6), (10, 4), (4, 10), (20, 20)])
@pytest.mark.parametrize("thresh", [0.5, 0.9])
def test_auction_matches_jv_objective(rng, shape, thresh):
    R, C = shape
    for _ in range(5):
        cost = rng.random(shape).astype(np.float32)
        rm = jnp.ones((R,), bool)
        cm = jnp.ones((C,), bool)
        r2c_jv, _ = solve_lap_masked(jnp.asarray(cost), rm, cm, thresh)
        r2c_au, c2r_au = solve_lap_auction(jnp.asarray(cost), rm, cm, thresh)
        obj_jv = _objective(cost, np.asarray(r2c_jv), thresh)
        obj_au = _objective(cost, np.asarray(r2c_au), thresh)
        # eps-optimality bound: n_matched * eps, eps = range * EPS_FRAC
        from motcpp_tpu.ops.auction import EPS_FRAC

        n_matched = int((np.asarray(r2c_au) >= 0).sum()) + 1
        tol = n_matched * thresh * EPS_FRAC + 1e-5
        assert obj_au <= obj_jv + tol, (cost, r2c_jv, r2c_au)
        # auction never matches above the cost limit
        for i, j in enumerate(np.asarray(r2c_au)):
            if j >= 0:
                assert cost[i, j] < thresh + 1e-6
        # consistency of the inverse map
        c2r_au = np.asarray(c2r_au)
        for i, j in enumerate(np.asarray(r2c_au)):
            if j >= 0:
                assert c2r_au[j] == i


def test_auction_clear_cut_matches_exact(rng):
    """With well-separated costs the auction matching is identical."""
    cost = np.full((5, 5), 0.9, np.float32)
    np.fill_diagonal(cost, 0.05)
    rm = jnp.ones((5,), bool)
    cm = jnp.ones((5,), bool)
    r2c, _ = solve_lap_auction(jnp.asarray(cost), rm, cm, 0.5)
    assert list(np.asarray(r2c)) == [0, 1, 2, 3, 4]


def test_auction_masked_and_empty():
    cost = np.random.default_rng(1).random((8, 6)).astype(np.float32)
    rm = np.zeros((8,), bool)
    cm = np.zeros((6,), bool)
    r2c, c2r = solve_lap_auction(jnp.asarray(cost), jnp.asarray(rm), jnp.asarray(cm), 0.5)
    assert all(np.asarray(r2c) == -1)
    assert all(np.asarray(c2r) == -1)


def test_auction_inf_and_negative_costs(rng):
    cost = np.array([[np.inf, -0.5], [-0.9, np.inf]], np.float32)
    rm = jnp.ones((2,), bool)
    cm = jnp.ones((2,), bool)
    r2c, _ = solve_lap_auction(jnp.asarray(cost), rm, cm, 0.3)
    assert list(np.asarray(r2c)) == [1, 0]


def test_sort_auction_equals_jv_on_separated_scene():
    """End-to-end: with well-separated objects, SORT with the auction
    solver produces identical tracks to the exact solver."""
    from motcpp_tpu.models.sort import Sort

    IMG = np.zeros((480, 640, 3), np.uint8)

    def run(lap_impl):
        tr = Sort(min_hits=1, max_age=3, max_tracks=16, max_dets=8,
                  lap_impl=lap_impl)
        outs = []
        for t in range(10):
            dets = np.array(
                [
                    [10 + 5 * t, 10, 60 + 5 * t, 110, 0.9, 0],
                    [300, 200 + 4 * t, 360, 320 + 4 * t, 0.8, 0],
                ],
                np.float32,
            )
            outs.append(np.sort(tr.update(dets, IMG), axis=0))
        return outs

    outs_jv = run("jv")
    outs_au = run("auction")
    for a, b in zip(outs_jv, outs_au):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_pallas_auction_matches_jnp(rng):
    """The Pallas kernel (interpret mode on CPU) must produce the same
    matchings as the jnp auction."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.ops.auction_pallas import solve_lap_auction_pallas

    for _ in range(5):
        cost = rng.random((12, 8)).astype(np.float32)
        rm = jnp.asarray(rng.random(12) > 0.2)
        cm = jnp.asarray(rng.random(8) > 0.2)
        r_p, c_p = solve_lap_auction_pallas(jnp.asarray(cost), rm, cm, 0.7)
        r_a, c_a = solve_lap_auction(jnp.asarray(cost), rm, cm, 0.7)
        np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_a))
        np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_a))


def test_pallas_auction_in_tracker():
    """lap_impl='auction_pallas' drives a tracker end-to-end."""
    from motcpp_tpu.models.sort import Sort

    IMG = np.zeros((480, 640, 3), np.uint8)
    tr = Sort(min_hits=1, max_age=3, max_tracks=16, max_dets=8,
              lap_impl="auction_pallas")
    ids = set()
    for t in range(6):
        d = np.array([[10 + 5 * t, 10, 60 + 5 * t, 110, 0.9, 0]], np.float32)
        out = tr.update(d, IMG)
        ids.update(out[:, 4].astype(int))
    assert ids == {1}


@pytest.mark.parametrize("impl", ["auction", "auction_pallas"])
def test_worst_case_random_costs_regression(impl):
    """The profile-crash input class (round 2, commit e9e782b) at
    reduced scale: dense uniform random costs are all-near-tie, the
    batched while_loop's worst case (measured ~417 rounds at S=4096 on
    TPU — a ~1.4 s device program per solve, NOT a runaway). The solver
    must terminate well under the round cap with a valid, in-threshold,
    eps-optimal matching for every instance."""
    import jax

    from motcpp_tpu.ops.auction import EPS_FRAC, MAX_ROUNDS

    S, K, N, thresh = 256, 64, 32, 0.9
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.uniform(0, 1, (S, K, N)).astype(np.float32))
    rmask = jnp.asarray(rng.random((S, K)) < 0.5)
    cmask = jnp.asarray(rng.random((S, N)) < 0.6)

    if impl == "auction":
        f = jax.jit(jax.vmap(
            lambda c, r, m: solve_lap_auction(c, r, m, thresh,
                                              return_rounds=True)
        ))
        r2c, c2r, rounds = f(cost, rmask, cmask)
        rounds = np.asarray(rounds)
        # termination head-room: the cap must never be the stopper
        assert rounds.max() < MAX_ROUNDS // 2, rounds.max()
    else:
        f = jax.jit(jax.vmap(
            lambda c, r, m: solve_lap_masked(c, r, m, thresh, impl=impl)
        ))
        r2c, c2r = f(cost, rmask, cmask)

    r2c = np.asarray(r2c)
    c2r = np.asarray(c2r)
    cost_np = np.asarray(cost)
    rm = np.asarray(rmask)
    cm = np.asarray(cmask)
    matched = r2c >= 0
    # masked rows/cols never match; matches respect the cost limit
    assert not (matched & ~rm).any()
    for s in range(S):
        js = r2c[s][matched[s]]
        assert len(js) == len(set(js.tolist()))  # injective
        assert cm[s][js].all()
        ii = np.nonzero(matched[s])[0]
        assert (cost_np[s][ii, js] < thresh + 1e-5).all()
        assert (c2r[s][js] == ii).all()  # inverse map consistent

    # spot-check eps-optimality vs exact JV on a handful of instances
    for s in range(0, S, 64):
        jv, _ = solve_lap_masked(
            jnp.asarray(cost_np[s]), jnp.asarray(rm[s]), jnp.asarray(cm[s]),
            thresh,
        )
        obj_jv = _objective(cost_np[s], np.asarray(jv), thresh)
        obj_au = _objective(cost_np[s], r2c[s], thresh)
        n_matched = int(matched[s].sum()) + 1
        assert obj_au <= obj_jv + n_matched * thresh * EPS_FRAC + 1e-5
