#!/usr/bin/env python3
"""A/B microbench: gather/scatter patterns vs ops.select primitives.

Times each ops/select.py helper against the jnp.take_along_axis /
``x.at[...]`` pattern it replaces, at tracker hot-path shapes
(S streams x K track slots x N det slots), on the default backend
(TPU under axon; pass --cpu to force the host).

Each case is jitted standalone so the comparison isolates the op
lowering. NOTE: standalone, most cases sit at the ~20 us dispatch
floor and the comparison is NOT predictive — the real effect is
fusion inside the vmapped tracker step, where the select forms
measured a 2.09x end-to-end OC-SORT win (see ops/select.py module
docstring and scripts/ablate_cost.py for stage-level attribution).

Usage: python scripts/microbench_select.py [--streams 2048] [--k 64]
           [--n 32] [--repeats 50] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, args, repeats):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(repeats):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / repeats * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=2048)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--ring", type=int, default=50)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from motcpp_tpu.ops import select

    S, K, N, R, D = args.streams, args.k, args.n, args.ring, args.d
    rng = np.random.default_rng(0)
    print(f"backend={jax.devices()[0].platform} S={S} K={K} N={N} R={R} D={D}")

    mat = jnp.asarray(rng.normal(size=(S, K, N)).astype(np.float32))
    idx_kn = jnp.asarray(rng.integers(0, N, (S, K)).astype(np.int32))
    tab = jnp.asarray(rng.normal(size=(S, N, D)).astype(np.float32))
    idx_k_of_n = jnp.asarray(rng.integers(0, N, (S, K)).astype(np.int32))
    ring = jnp.asarray(rng.normal(size=(S, K, R, D)).astype(np.float32))
    slot = jnp.asarray(rng.integers(0, R, (S, K)).astype(np.int32))
    new = jnp.asarray(rng.normal(size=(S, K, D)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, (S, K)).astype(bool))
    d2t = jnp.asarray(
        np.where(
            rng.integers(0, 2, (S, N)).astype(bool),
            rng.integers(0, K, (S, N)),
            -1,
        ).astype(np.int32)
    )
    rows = jnp.asarray(rng.integers(0, 2, (S, K)).astype(bool))
    cols = jnp.asarray(rng.integers(0, 2, (S, N)).astype(bool))

    cases = []

    # 1. take_per_row vs take_along_axis
    def tpr_gather(m, i):
        return jnp.take_along_axis(
            m, jnp.clip(i, 0, N - 1)[..., None], axis=-1
        )[..., 0]

    cases.append(("take_per_row", tpr_gather, select.take_per_row,
                  (mat, idx_kn)))

    # 2. gather_rows vs vmapped row gather
    def gr_gather(t, i):
        return jax.vmap(lambda tt, ii: tt[jnp.clip(ii, 0, N - 1)])(t, i)

    cases.append(("gather_rows", gr_gather, select.gather_rows,
                  (tab, idx_k_of_n)))

    # 3. take_slot vs take_along_axis on the ring axis
    def ts_gather(r, s):
        return jnp.take_along_axis(r, s[..., None, None], axis=-2)[..., 0, :]

    cases.append(("take_slot", ts_gather, select.take_slot, (ring, slot)))

    # 4. write_slot vs at[].set
    def ws_scatter(r, s, nw, m):
        flat = r.reshape(S * K, R, D)
        upd = flat.at[jnp.arange(S * K), s.reshape(-1)].set(
            nw.reshape(S * K, D)
        )
        return jnp.where(m.reshape(S * K, 1, 1), upd, flat).reshape(r.shape)

    cases.append(("write_slot", ws_scatter, select.write_slot,
                  (ring, slot, new, mask)))

    # 5. invert_matching vs scatter
    def im_scatter(d, K=K):
        def one(dd):
            return (
                jnp.full((K,), -1, jnp.int32)
                .at[jnp.where(dd >= 0, dd, K)]
                .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
            )

        return jax.vmap(one)(d)

    cases.append(("invert_matching", im_scatter,
                  lambda d: select.invert_matching(d, K), (d2t,)))

    # 6. rank_match vs rank scatter-then-gather
    def rm_scatter(r, c):
        row_rank = jnp.cumsum(r.astype(jnp.int32), axis=-1) - 1
        col_rank = jnp.cumsum(c.astype(jnp.int32), axis=-1) - 1
        n_cols = c.sum(axis=-1, keepdims=True)

        def one(rr, rrank, cc, crank, nc):
            pos_by_rank = (
                jnp.full((K + N,), 0, jnp.int32)
                .at[jnp.where(cc, crank, K + N - 1)]
                .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
            )
            paired = rr & (rrank < nc)
            col = pos_by_rank[jnp.clip(rrank, 0, K + N - 1)]
            return paired, jnp.where(paired, col, 0)

        return jax.vmap(one)(r, row_rank, c, col_rank, n_cols[:, 0])

    cases.append(("rank_match", rm_scatter, select.rank_match, (rows, cols)))

    # 7. set_at_col vs at[].set
    def sac_scatter(m, c):
        flat = m.reshape(S * K, N)
        return flat.at[jnp.arange(S * K), c.reshape(-1)].set(0.0).reshape(
            m.shape
        )

    cases.append(("set_at_col", sac_scatter,
                  lambda m, c: select.set_at_col(m, c, 0.0), (mat, idx_kn)))

    for name, old, newf, a in cases:
        t_old = bench(old, a, args.repeats)
        t_new = bench(newf, a, args.repeats)
        # exactness spot check (masked cases are pinned in tests/test_select)
        print(f"{name:18s} gather {t_old:9.1f} us   select {t_new:9.1f} us"
              f"   {t_old / t_new:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
