"""Pallas TPU kernel for the auction assignment solver.

The jnp auction (ops/auction.py) is batched with ``vmap``, which gives
every stream the SAME number of bidding rounds — the worst-converging
stream stalls all of them, and each round's (S, K, N) intermediates
round-trip HBM. This kernel grids the stream axis instead, with **B
streams per grid program**: each program holds a (B, K, N) block in
VMEM and runs the bidding ``while_loop`` to the block's own
convergence.

Why B > 1 (measured on TPU v5e, S=2048 BoostTrack rollouts,
scripts/ablate_cost.py): a one-stream-per-program grid (the naive
vmap-of-pallas_call lowering) pays a fixed per-program overhead per
stream — 81 ms/frame-batch at B=1 vs 60-62 ms at B=2-4 in-vivo, and
1,358 ms vs 103 ms (B=4) on worst-case random cost matrices, where
serializing every stream's bidding wars is catastrophic. Blocks larger
than ~4 turn back down (B=16: 124 ms in-vivo at eps=range/256): each
block pays the MAX bidding rounds of its members, and the in-vivo
rounds distribution is heavy-tailed. B=4 with eps=range/64 (see
ops/auction.py) is the measured sweet spot; B adapts below that to
stay within a fixed VMEM budget for large (K, N).

Any level of ``vmap`` nesting lands in the batched kernel via a
recursive ``jax.custom_batching.custom_vmap``: the unbatched call maps
to the (S, K, N) form, and a further vmap of THAT flattens its two
leading axes and recurses — so stage-batched solves inside a
stream-vmapped tracker step still become one blocked grid.

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

from motcpp_tpu.ops.auction import EPS_FRAC, MAX_ROUNDS

NEG = -1e30
BIG = 1e7
COST_CLIP = 1e6
# VMEM budget for one program's live (B, K, N) intermediates (the
# bidding body keeps ~10 such arrays live); B adapts to K*N under it.
# The cap of 4 is measured (see module doc): larger blocks couple more
# streams to their block's slowest bidding war for no extra gain.
_VMEM_BUDGET_BYTES = 2 * 1024 * 1024


def _block_streams(K: int, N: int) -> int:
    b = _VMEM_BUDGET_BYTES // max(K * N * 4 * 12, 1)
    return max(1, min(4, int(b)))


def _auction_kernel(max_rounds, eps_frac, cost_ref, rm_ref, cm_ref, th_ref,
                    r2c_ref, c2r_ref):
    B, K, N = cost_ref.shape
    cost = cost_ref[:]
    rm = rm_ref[:] > 0.5  # (B, K, 1)
    cm = cm_ref[:] > 0.5  # (B, 1, N)
    th = th_ref[:]  # (B, 1, 1)

    pair_ok = rm & cm
    b = jnp.where(pair_ok, th - cost, NEG)
    b_pos = jnp.where(pair_ok, b, 0.0)
    b_max = jnp.max(jnp.max(b_pos, axis=2, keepdims=True), axis=1,
                    keepdims=True)  # (B, 1, 1) per-stream benefit range
    eps = jnp.maximum(jnp.maximum(b_max, 1e-6) * eps_frac, 1e-7)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, K, N), 2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, K, N), 1)

    def cond(st):
        rounds, p, r2c, c2r = st
        return jnp.any(rm & (r2c == -1)) & (rounds < max_rounds)

    def body(st):
        rounds, p, r2c, c2r = st
        unassigned = rm & (r2c == -1)  # (B, K, 1)

        v = b - p  # (B, K, N)
        v1 = jnp.max(v, axis=2, keepdims=True)  # (B, K, 1)
        is_best = v == v1
        j_star = jnp.min(
            jnp.where(is_best, col_ids, N), axis=2, keepdims=True
        )  # (B, K, 1)
        v_wo = jnp.where(col_ids == j_star, NEG, v)
        v2 = jnp.maximum(jnp.max(v_wo, axis=2, keepdims=True), 0.0)

        bidding = unassigned & (v1 > 0.0)
        r2c = jnp.where(unassigned & (v1 <= 0.0), -2, r2c)

        # bid matrix: each bidding row places p[j*] + margin + eps at j*
        bid_mat = jnp.where(
            bidding & (col_ids == j_star), p + (v1 - v2) + eps, NEG
        )
        best_bid = jnp.max(bid_mat, axis=1, keepdims=True)  # (B, 1, N)
        has_bid = best_bid > NEG / 2
        winner = jnp.min(
            jnp.where((bid_mat == best_bid) & has_bid, row_ids, K),
            axis=1,
            keepdims=True,
        )  # (B, 1, N)

        p = jnp.where(has_bid, best_bid, p)
        evicted = jnp.any(
            has_bid & (c2r == row_ids), axis=2, keepdims=True
        )  # (B, K, 1)
        r2c = jnp.where(evicted, -1, r2c)
        c2r = jnp.where(has_bid, winner, c2r)
        win_mask = has_bid & (winner == row_ids)  # (B, K, N)
        won = jnp.any(win_mask, axis=2, keepdims=True)
        won_col = jnp.min(
            jnp.where(win_mask, col_ids, N), axis=2, keepdims=True
        )
        r2c = jnp.where(won, won_col, r2c)
        return rounds + 1, p, r2c, c2r

    p0 = jnp.zeros((B, 1, N), jnp.float32)
    r2c0 = jnp.where(rm, -1, -2).astype(jnp.int32)  # (B, K, 1)
    c2r0 = jnp.full((B, 1, N), -1, jnp.int32)
    _, _, r2c, _ = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), p0, r2c0, c2r0)
    )

    row2col = jnp.where(r2c >= 0, r2c, -1)  # (B, K, 1)
    # inverse map, gather-free
    inv = (row2col == col_ids) & (row2col >= 0)  # (B, K, N)
    c2r_out = jnp.min(jnp.where(inv, row_ids, K), axis=1, keepdims=True)
    c2r_out = jnp.where(c2r_out < K, c2r_out, -1)
    r2c_ref[:] = row2col
    c2r_ref[:] = c2r_out


def _pallas_batched(cost, rm, cm, th, eps_frac=EPS_FRAC,
                    max_rounds=MAX_ROUNDS):
    """Grid-blocked solve: (S, K, N), (S, K), (S, N), (S,) ->
    (S, K) row2col, (S, N) col2row."""
    S, K, N = cost.shape
    cost = jnp.clip(cost.astype(jnp.float32), -COST_CLIP, COST_CLIP)
    cost = jnp.where(jnp.isfinite(cost), cost, BIG)
    rm_f = rm.astype(jnp.float32)[:, :, None]  # (S, K, 1)
    cm_f = cm.astype(jnp.float32)[:, None, :]  # (S, 1, N)
    th_f = jnp.broadcast_to(
        jnp.asarray(th, jnp.float32).reshape(S, 1, 1), (S, 1, 1)
    )

    B = _block_streams(K, N)
    Sp = -(-S // B) * B
    if Sp != S:  # pad with masked-out streams (resolve in zero rounds)
        pad = ((0, Sp - S), (0, 0), (0, 0))
        cost = jnp.pad(cost, pad)
        rm_f = jnp.pad(rm_f, pad)
        cm_f = jnp.pad(cm_f, pad)
        th_f = jnp.pad(th_f, pad)

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_auction_kernel, max_rounds, eps_frac)
    r2c, c2r = pl.pallas_call(
        kernel,
        grid=(Sp // B,),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((Sp, 1, N), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((B, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, K, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(cost, rm_f, cm_f, th_f)
    return r2c[:S, :, 0], c2r[:S, 0, :]


# --- custom-vmap plumbing: any vmap nesting lands in one blocked grid ---


@jax.custom_batching.custom_vmap
def _solve_batched(cost, rm, cm, th):
    """(S, K, N) form; vmapping this flattens and recurses."""
    return _pallas_batched(cost, rm, cm, th)


@_solve_batched.def_vmap
def _solve_batched_vmap(axis_size, in_batched, cost, rm, cm, th):
    def bc(x, is_b):
        return x if is_b else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape
        )

    cost = bc(cost, in_batched[0])
    rm = bc(rm, in_batched[1])
    cm = bc(cm, in_batched[2])
    th = bc(th, in_batched[3])
    A, S = cost.shape[0], cost.shape[1]
    r2c, c2r = _solve_batched(
        cost.reshape(A * S, *cost.shape[2:]),
        rm.reshape(A * S, rm.shape[2]),
        cm.reshape(A * S, cm.shape[2]),
        th.reshape(A * S),
    )
    return (r2c.reshape(A, S, -1), c2r.reshape(A, S, -1)), (True, True)


@jax.custom_batching.custom_vmap
def _solve_single(cost, rm, cm, th):
    r2c, c2r = _pallas_batched(
        cost[None], rm[None], cm[None], th.reshape(1)
    )
    return r2c[0], c2r[0]


@_solve_single.def_vmap
def _solve_single_vmap(axis_size, in_batched, cost, rm, cm, th):
    def bc(x, is_b):
        return x if is_b else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape
        )

    out = _solve_batched(
        bc(cost, in_batched[0]),
        bc(rm, in_batched[1]),
        bc(cm, in_batched[2]),
        bc(th, in_batched[3]).reshape(axis_size),
    )
    return out, (True, True)


def solve_lap_auction_pallas(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray,
    thresh,
    eps_frac: float = EPS_FRAC,
    max_rounds: int = MAX_ROUNDS,
):
    """Pallas-backed masked assignment; same contract as
    solve_lap_masked. Interpreted off-TPU so tests run on CPU.

    With default eps/rounds the call routes through the custom-vmap
    path (B-streams-per-program blocked grid under any vmap nesting);
    explicit overrides take a direct single-problem call.
    """
    th = jnp.asarray(thresh, jnp.float32)
    if eps_frac == EPS_FRAC and max_rounds == MAX_ROUNDS:
        return _solve_single(cost, row_mask, col_mask, th)
    r2c, c2r = _pallas_batched(
        cost[None], row_mask[None], col_mask[None], th.reshape(1),
        eps_frac=eps_frac, max_rounds=max_rounds,
    )
    return r2c[0], c2r[0]
