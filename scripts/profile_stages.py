#!/usr/bin/env python3
"""Stage-level microbenchmarks at bench.py's saturation shape
(S=4096 streams, K=64 track slots, N=32 detections): measures each hot
stage in isolation as a scanned, vmapped XLA program so its cost is
comparable to one frame-batch of the full tracker (~61 ms at S=4096).

Usage: python scripts/profile_stages.py [--streams 4096] [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed_scan(fn, args, iters, label, chunk=None):
    """Scan fn over `iters` dummy steps; report ms per step.

    The first float array argument is perturbed by the carry each step —
    without that, XLA hoists the (loop-invariant) stage out of the scan
    and the measurement collapses to loop overhead.

    ``chunk`` bounds how many steps go into ONE device program: the
    iters are split into ceil(iters/chunk) program executions with a
    host sync between. Use it for stages whose single step already runs
    ~seconds (the batched worst-case auction: 417 bidding rounds ≈ 1.4 s
    at S=4096) — a single multi-minute XLA program sporadically trips
    the axon tunnel's RPC deadline and drops the TPU worker
    (UNAVAILABLE, multi-minute reconnect; diagnosed round 3, was
    commit e9e782b's crash).
    """
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        perturbed = []
        poisoned = False
        for a in args:
            if not poisoned and hasattr(a, "dtype") and jnp.issubdtype(
                a.dtype, jnp.floating
            ):
                perturbed.append(a + carry * 1e-12)
                poisoned = True
            else:
                perturbed.append(a)
        out = fn(*perturbed)
        # fold output into carry so nothing is dead-code-eliminated
        leaf = jax.tree_util.tree_leaves(out)[0]
        return carry + jnp.sum(leaf.astype(jnp.float32)), None

    per_prog = min(chunk or iters, iters)
    n_progs = -(-iters // per_prog)

    prog = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=per_prog)[0]
    )

    def run():
        c = jnp.float32(0.0)
        for _ in range(n_progs):
            c = prog(c)
            float(np.asarray(c))  # materialize (axon abort detection)
        return c

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    run()
    per_step_ms = (time.time() - t0) / (n_progs * per_prog) * 1e3
    print(f"{label:42s} {per_step_ms:8.2f} ms/step   (compile {compile_s:.0f}s)")
    return per_step_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    # The jnp "auction" stage is back in the defaults (round 3): the
    # round-2 worker crashes were NOT a solver fault — worst-case random
    # costs drive the batched while_loop to ~417 rounds (~1.4 s/solve at
    # S=4096), and 30 solves chained into ONE scanned XLA program made a
    # minutes-long device execution that sporadically tripped the axon
    # tunnel RPC deadline. timed_scan(chunk=1) now bounds every device
    # program to a single solve. Note random-cost microbenches still
    # overstate in-vivo auction cost ~15x (real cost matrices are
    # sparse/distinct; see tests/test_auction.py worst-case pins).
    ap.add_argument("--stages", nargs="*",
                    default=["auction", "pallas", "iou", "kf"])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    S, K, N = args.streams, 64, 32
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.uniform(0, 1, (S, K, N)).astype(np.float32))
    rmask = jnp.asarray(rng.random((S, K)) < 0.5)
    cmask = jnp.asarray(rng.random((S, N)) < 0.6)

    if "auction" in args.stages:
        from motcpp_tpu.ops.lap import solve_lap_masked

        fn = jax.vmap(
            lambda c, r, m: solve_lap_masked(c, r, m, 0.9, impl="auction")
        )
        timed_scan(fn, (cost, rmask, cmask), args.iters,
                   f"auction (jnp) {S}x({K}x{N})", chunk=1)

    if "pallas" in args.stages:
        from motcpp_tpu.ops.lap import solve_lap_masked

        fn = jax.vmap(
            lambda c, r, m: solve_lap_masked(c, r, m, 0.9, impl="auction_pallas")
        )
        timed_scan(fn, (cost, rmask, cmask), args.iters,
                   f"auction (pallas) {S}x({K}x{N})", chunk=1)

    if "iou" in args.stages:
        from motcpp_tpu.ops.iou import iou_batch

        b1 = jnp.asarray(rng.uniform(0, 1000, (S, K, 4)).astype(np.float32))
        b2 = jnp.asarray(rng.uniform(0, 1000, (S, N, 4)).astype(np.float32))
        fn = jax.vmap(iou_batch)
        timed_scan(fn, (b1, b2), args.iters, f"iou_batch {S}x({K}x{N})")

    if "sofjax" in args.stages:
        from motcpp_tpu.motion.cmc import sof_jax_batch

        B, H, W = 64, 270, 480  # 0.25x-downscaled 1080p, 64 streams
        prev = jnp.asarray(
            rng.random((B, H, W)).astype(np.float32) * 255.0
        )
        cur = jnp.roll(prev, (2, 3), axis=(1, 2))
        fn = lambda p, c: sof_jax_batch(p, c)  # noqa: E731
        ms = timed_scan(fn, (prev, cur), args.iters,
                        f"sofjax CMC batch {B}x({H}x{W})")
        print(f"{'':42s} -> {B / (ms / 1e3):,.0f} warps/s/chip")

    if "kf" in args.stages:
        from motcpp_tpu.ops.kalman.gaussian import kf_xyah

        kf = kf_xyah
        mean = jnp.asarray(rng.normal(0, 1, (S, K, 8)).astype(np.float32))
        cov = jnp.broadcast_to(jnp.eye(8, dtype=jnp.float32), (S, K, 8, 8))
        meas = jnp.asarray(rng.normal(0, 1, (S, K, 4)).astype(np.float32))

        pred = jax.vmap(jax.vmap(kf.predict))
        timed_scan(pred, (mean, cov), args.iters, f"KF xyah predict {S}x{K}")

        upd = jax.vmap(jax.vmap(kf.update))
        timed_scan(upd, (mean, cov, meas), args.iters, f"KF xyah update {S}x{K}")


if __name__ == "__main__":
    main()
