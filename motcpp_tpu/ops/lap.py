"""Jit-compatible linear assignment (Jonker-Volgenant) with cost limit.

TPU-native replacement for the reference's malloc'd C lapjv solver
(reference: include/motcpp/association/lap_solver.hpp:213-237) and its
cost-limit square padding (lap_solver.hpp:296-320).

The reference pads an (R, C) cost matrix to an (R+C, R+C) square with
``costLimit/2`` on the real-dummy blocks and 0 on the dummy-dummy block,
then solves the square LAP; a real pair (i, j) survives iff it appears in
the optimal square assignment — equivalent to a *partial* matching M
minimizing  sum_{(i,j) in M} (cost(i,j) - costLimit)  over matchings,
i.e. a pair is profitable iff cost < costLimit.

We solve that reduced problem directly: augment the (R, C) matrix with R
private per-row dummy columns at cost ``costLimit`` (row i may only take
dummy i), giving an (R, C+R) rectangular LAP where every row is assigned.
This halves the number of augmenting paths vs. the square padding while
provably producing the same optimal matched set (objectives differ by a
constant). The solver itself is the classic shortest-augmenting-path
Jonker-Volgenant (exact, like scipy.optimize.linear_sum_assignment),
written as ``lax.fori_loop`` over rows with a vectorized Dijkstra
``lax.while_loop`` inside — static shapes throughout, so it jits, vmaps
over streams, and shards over a device mesh.

Masked (padded) rows and columns resolve to dummies in O(1) Dijkstra
steps, so fixed-capacity padding costs little.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Finite stand-in for +inf / masked-out pairs. Large enough to never win
# against a real cost or the cost limit, small enough for exact f32 math.
BIG = 1e7
COST_CLIP = 1e6
INF = jnp.inf


def _augmented_cost(cost, row_mask, col_mask, thresh):
    """Build the (R, C+R) augmented matrix described in the module doc.

    * masked-out / non-finite real pairs -> BIG (never matched: the private
      dummy at ``thresh`` is always cheaper than BIG)
    * valid row i's private dummy column C+i -> thresh
    * masked-out row i's private dummy -> 0 (self-resolves instantly)
    * other rows' private dummies -> BIG
    """
    R, C = cost.shape
    cost = jnp.clip(cost, -COST_CLIP, COST_CLIP)
    cost = jnp.where(jnp.isfinite(cost), cost, BIG)
    pair_ok = row_mask[:, None] & col_mask[None, :]
    real = jnp.where(pair_ok, cost, BIG)
    eye = jnp.eye(R, dtype=bool)
    dummy_cost = jnp.where(row_mask, thresh, 0.0)
    dummy = jnp.where(eye, dummy_cost[:, None], BIG)
    return jnp.concatenate([real, dummy], axis=1)


def _lsap_rectangular(aug: jnp.ndarray):
    """Exact shortest-augmenting-path JV on an (R, NC) matrix, R <= NC.

    Returns row2col (R,) int32 — every row assigned to a distinct column.
    """
    R, NC = aug.shape
    dtype = aug.dtype

    def solve_row(cur_row, carry):
        u, v, row2col, col2row = carry

        # --- Dijkstra over columns from cur_row -------------------------
        def cond(st):
            return ~st[0]

        def body(st):
            _, i, min_val, d, pred, SC, SR = st
            # relax all unvisited columns from row i
            r = min_val + aug[i] - u[i] - v
            upd = (~SC) & (r < d)
            d = jnp.where(upd, r, d)
            pred = jnp.where(upd, i, pred)
            # pick the cheapest unvisited column
            dm = jnp.where(SC, INF, d)
            j = jnp.argmin(dm).astype(jnp.int32)
            mv = dm[j]
            SC = SC.at[j].set(True)
            owner = col2row[j]
            found = owner < 0
            i_next = jnp.where(found, i, owner)
            SR = SR.at[jnp.maximum(i_next, 0)].set(True)
            return (found, i_next, mv, d, pred, SC, SR)

        d0 = jnp.full((NC,), INF, dtype)
        pred0 = jnp.zeros((NC,), jnp.int32)
        SC0 = jnp.zeros((NC,), bool)
        SR0 = jnp.zeros((R,), bool).at[cur_row].set(True)
        st = (jnp.array(False), cur_row.astype(jnp.int32), jnp.array(0.0, dtype), d0, pred0, SC0, SR0)
        found, _, min_val, d, pred, SC, SR = lax.while_loop(cond, body, st)

        # sink = the column that terminated the search (the unique visited
        # column with no owner)
        sink = jnp.argmax(SC & (col2row < 0)).astype(jnp.int32)

        # --- dual updates (as in the classical JV / scipy lsap) ----------
        u = u.at[cur_row].add(min_val)
        assigned = jnp.clip(row2col, 0, NC - 1)
        du = jnp.where(
            SR & (jnp.arange(R) != cur_row), min_val - d[assigned], 0.0
        )
        u = u + du
        v = v + jnp.where(SC, d - min_val, 0.0)

        # --- augment along the predecessor path --------------------------
        def aug_cond(st2):
            return ~st2[0]

        def aug_body(st2):
            _, j, r2c, c2r = st2
            i = pred[j]
            c2r = c2r.at[j].set(i)
            j_next = r2c[i]
            r2c = r2c.at[i].set(j)
            return (i == cur_row, j_next, r2c, c2r)

        _, _, row2col, col2row = lax.while_loop(
            aug_cond, aug_body, (jnp.array(False), sink, row2col, col2row)
        )
        return u, v, row2col, col2row

    u0 = jnp.zeros((R,), dtype)
    v0 = jnp.zeros((NC,), dtype)
    r2c0 = jnp.full((R,), -1, jnp.int32)
    c2r0 = jnp.full((NC,), -1, jnp.int32)
    _, _, row2col, _ = lax.fori_loop(0, R, solve_row, (u0, v0, r2c0, c2r0))
    return row2col


def solve_lap_masked(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
    impl: str = "jv",
):
    """Masked linear assignment with cost limit, jit/vmap-compatible.

    Args:
        cost: (R, C) cost matrix (lower = better). Non-finite entries are
            treated as unmatched (like the reference's inf-gated costs).
        row_mask: (R,) bool — valid rows.
        col_mask: (C,) bool — valid columns.
        thresh: scalar cost limit; a pair is only matched if profitable
            vs. leaving both endpoints unmatched (reference semantics:
            lap_solver.hpp:296-320 with costLimit padding).
        impl: "jv" (exact shortest-augmenting-path, host/parity paths) or
            "auction" (eps-optimal parallel bidding, the TPU-fast path —
            see ops/auction.py).

    Returns:
        row2col: (R,) int32, matched column per row or -1.
        col2row: (C,) int32, matched row per column or -1.
    """
    if impl == "auction":
        from motcpp_tpu.ops.auction import solve_lap_auction

        return solve_lap_auction(cost, row_mask, col_mask, thresh)
    if impl == "auction_pallas":
        from motcpp_tpu.ops.auction_pallas import solve_lap_auction_pallas

        return solve_lap_auction_pallas(cost, row_mask, col_mask, thresh)
    R, C = cost.shape
    thresh = jnp.asarray(thresh, cost.dtype)
    aug = _augmented_cost(cost.astype(jnp.float32), row_mask, col_mask, thresh)
    r2c = _lsap_rectangular(aug)
    row2col = jnp.where((r2c < C) & row_mask, r2c, -1)
    rows = jnp.arange(R, dtype=jnp.int32)
    # unmatched rows scatter to out-of-range index C and are dropped
    col2row = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(row2col >= 0, row2col, C)
    ].set(rows, mode="drop")
    return row2col, col2row


@jax.jit
def solve_lap(cost: jnp.ndarray, thresh):
    """Unmasked convenience wrapper over :func:`solve_lap_masked`."""
    R, C = cost.shape
    return solve_lap_masked(
        cost, jnp.ones((R,), bool), jnp.ones((C,), bool), thresh
    )
