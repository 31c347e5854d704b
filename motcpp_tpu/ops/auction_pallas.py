"""Pallas TPU kernel for the auction assignment solver.

The jnp auction (ops/auction.py) is batched with ``vmap``, which gives
every stream the SAME number of bidding rounds — the worst-converging
stream stalls all of them, and each round's (S, K, N) intermediates
round-trip HBM. This kernel instead grids one program per stream: the
whole (K, N) problem lives in VMEM, the bidding ``while_loop`` runs to
that stream's own convergence, and nothing touches HBM until the final
(K,)/(N,) assignment writes.

Same cost-limit semantics as ops/auction.py (single-phase epsilon
proportional to the benefit range, null opt-out). Gather-free: every
argmax/lookup is expressed as broadcast compares against
``broadcasted_iota`` index planes, which is the Mosaic-friendly form.

Used via ``lap_impl="auction_pallas"`` on any tracker; transparently
runs in interpreter mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
BIG = 1e7
COST_CLIP = 1e6


def _auction_kernel(max_rounds, eps_frac, cost_ref, rm_ref, cm_ref, th_ref,
                    r2c_ref, c2r_ref):
    K, N = cost_ref.shape
    cost = cost_ref[:]
    rm = rm_ref[:] > 0.5  # (K, 1)
    cm = cm_ref[:] > 0.5  # (1, N)
    th = th_ref[0, 0]

    pair_ok = rm & cm
    b = jnp.where(pair_ok, th - cost, NEG)
    b_max = jnp.maximum(jnp.max(jnp.where(pair_ok, b, 0.0)), 1e-6)
    eps = jnp.maximum(b_max * eps_frac, 1e-7)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, N), 0)

    def cond(st):
        rounds, p, r2c, c2r = st
        return jnp.any(rm & (r2c == -1)) & (rounds < max_rounds)

    def body(st):
        rounds, p, r2c, c2r = st
        unassigned = rm & (r2c == -1)  # (K, 1)

        v = b - p  # (K, N)
        v1 = jnp.max(v, axis=1, keepdims=True)  # (K, 1)
        is_best = v == v1
        j_star = jnp.min(
            jnp.where(is_best, col_ids, N), axis=1, keepdims=True
        )  # (K, 1)
        v_wo = jnp.where(col_ids == j_star, NEG, v)
        v2 = jnp.maximum(jnp.max(v_wo, axis=1, keepdims=True), 0.0)

        bidding = unassigned & (v1 > 0.0)
        r2c = jnp.where(unassigned & (v1 <= 0.0), -2, r2c)

        # bid matrix: each bidding row places p[j*] + margin + eps at j*
        bid_mat = jnp.where(
            bidding & (col_ids == j_star), p + (v1 - v2) + eps, NEG
        )
        best_bid = jnp.max(bid_mat, axis=0, keepdims=True)  # (1, N)
        has_bid = best_bid > NEG / 2
        winner = jnp.min(
            jnp.where((bid_mat == best_bid) & has_bid, row_ids, K),
            axis=0,
            keepdims=True,
        )  # (1, N)

        p = jnp.where(has_bid, best_bid, p)
        evicted = jnp.any(
            has_bid & (c2r == row_ids), axis=1, keepdims=True
        )  # (K, 1)
        r2c = jnp.where(evicted, -1, r2c)
        c2r = jnp.where(has_bid, winner, c2r)
        win_mask = has_bid & (winner == row_ids)  # (K, N)
        won = jnp.any(win_mask, axis=1, keepdims=True)
        won_col = jnp.min(
            jnp.where(win_mask, col_ids, N), axis=1, keepdims=True
        )
        r2c = jnp.where(won, won_col, r2c)
        return rounds + 1, p, r2c, c2r

    p0 = jnp.zeros((1, N), jnp.float32)
    r2c0 = jnp.where(rm, -1, -2).astype(jnp.int32)  # (K, 1)
    c2r0 = jnp.full((1, N), -1, jnp.int32)
    _, _, r2c, _ = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), p0, r2c0, c2r0)
    )

    row2col = jnp.where(r2c >= 0, r2c, -1)  # (K, 1)
    # inverse map, gather-free
    inv = (row2col == col_ids) & (row2col >= 0)  # (K, N)
    c2r_out = jnp.min(jnp.where(inv, row_ids, K), axis=0, keepdims=True)
    c2r_out = jnp.where(c2r_out < K, c2r_out, -1)
    r2c_ref[:] = row2col
    c2r_ref[:] = c2r_out


@functools.partial(jax.jit, static_argnames=("eps_frac", "max_rounds"))
def solve_lap_auction_pallas(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
    eps_frac: float = 1.0 / 256.0,
    max_rounds: int = 1000,
):
    """Pallas-backed masked assignment; same contract as
    solve_lap_masked. Interpreted off-TPU so tests run on CPU."""
    K, N = cost.shape
    cost = jnp.clip(cost.astype(jnp.float32), -COST_CLIP, COST_CLIP)
    cost = jnp.where(jnp.isfinite(cost), cost, BIG)
    rm = row_mask.astype(jnp.float32)[:, None]
    cm = col_mask.astype(jnp.float32)[None, :]
    th = jnp.asarray(thresh, jnp.float32).reshape(1, 1)

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_auction_kernel, max_rounds, eps_frac)
    r2c, c2r = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cost, rm, cm, th)
    return r2c[:, 0], c2r[0, :]
