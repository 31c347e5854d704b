#!/usr/bin/env python3
"""Attribute a tracker's per-frame cost to stages by ablation.

Rebuilds the bench rollout with individual hot stages stubbed out
(monkeypatched to cheap same-shape substitutes) and reports the
throughput delta of each ablation — a robust way to rank optimization
targets without a working xplane pipeline over the axon tunnel.

The stubs are NOT semantically valid trackers; only timing matters.

Usage: python scripts/ablate_cost.py --tracker boosttrack \
           [--streams 2048] [--ablate lap kf ...]
"""

import argparse
import importlib
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_rollout(tracker, args, label):
    import jax.numpy as jnp

    import bench
    from motcpp_tpu.parallel import MultiStreamRunner

    init_fn, step_fn = bench.build_tracker_fns(tracker, args)
    S, T, N = args.streams, args.frames, args.max_dets
    rng = np.random.default_rng(0)
    dets, masks = bench.synth_stream_dets(rng, T, S, N, n_obj=args.objects)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=S)
    dets_j, masks_j = jnp.asarray(dets), jnp.asarray(masks)

    t0 = time.time()
    out = runner.run(dets_j, masks_j)
    n_emit = int(np.asarray(out[1]).sum())
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.repeats):
        out = runner.run(dets_j, masks_j)
        float(np.asarray(out[0][-1]).ravel()[0])
    dt = (time.time() - t0) / args.repeats
    ms = dt / T * 1e3
    print(f"{label:28s} {ms:8.2f} ms/frame-batch  "
          f"({S*T/dt/30:,.0f} streams@30fps, {n_emit} emissions, "
          f"compile {compile_s:.0f}s)", flush=True)
    return ms


def make_stubs(mod):
    """Cheap same-shape substitutes for the hot stages."""
    import jax.numpy as jnp

    def lap_stub(cost, row_mask, col_mask, thresh, impl="jv"):
        # greedy argmin, no loop: NOT a valid assignment, same shapes
        R, C = cost.shape
        r2c = jnp.argmin(cost, axis=1).astype(jnp.int32)
        r2c = jnp.where(row_mask, r2c, -1)
        c2r = jnp.argmin(cost, axis=0).astype(jnp.int32)
        c2r = jnp.where(col_mask, c2r, -1)
        return r2c, c2r

    def iou_stub(a, b):
        # one broadcasted subtraction instead of the full IoU algebra
        return (a[..., :, None, 0] - b[..., None, :, 0]) * 1e-4

    def asso_stub(name, frame_width=1920, frame_height=1080):
        # dispatch-compatible with get_asso_fn, returns iou_stub
        return iou_stub

    def kf_predict_stub(x, P, params=None):
        return x, P

    def kf_update_stub(x, P, z, params=None):
        return x + 1e-12 * jnp.sum(z, axis=-1, keepdims=True), P

    def ring_stub(obs_ring, obs_age, age, delta_t):
        # newest-slot gather only (skips the delta_t search loop)
        return obs_ring[:, 0, :]

    def apply_stub(st_vars, match_t2d, dets, frame_age):
        # keep the (tiny) data dependency so nothing is DCE'd
        return tuple(
            v + 0 * jnp.sum(match_t2d).astype(v.dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact)
            else v
            for v in st_vars
        )

    return {
        "lap": ("solve_lap_masked", lap_stub),
        "iou": ("iou_batch", iou_stub),
        "asso": ("get_asso_fn", asso_stub),
        "kf_predict": ("xysr_predict", kf_predict_stub),
        "kf_update": ("xysr_update", kf_update_stub),
        "ring": ("_k_previous_obs", ring_stub),
        "apply": ("_apply_track_update", apply_stub),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracker", default="boosttrack")
    ap.add_argument("--streams", type=int, default=2048)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--objects", type=int, default=16)
    ap.add_argument("--max-tracks", type=int, default=64)
    ap.add_argument("--max-dets", type=int, default=32)
    ap.add_argument("--lap", default="auction_pallas")
    ap.add_argument("--emb-dim", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ablate", nargs="*", default=["lap", "iou"])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    mod = importlib.import_module(f"motcpp_tpu.models.{args.tracker}")
    base = time_rollout(args.tracker, args, "baseline")
    stubs = make_stubs(mod)
    for name in args.ablate:
        if name not in stubs:
            print(f"# no stub for {name}; skipping")
            continue
        attr, fn = stubs[name]
        if not hasattr(mod, attr):
            print(f"# {args.tracker} does not use {attr}; skipping")
            continue
        orig = getattr(mod, attr)
        setattr(mod, attr, fn)
        try:
            ms = time_rollout(args.tracker, args, f"- {name}")
        finally:
            setattr(mod, attr, orig)
        print(f"  -> {name} share: {base - ms:+.2f} ms "
              f"({(base - ms) / base * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
