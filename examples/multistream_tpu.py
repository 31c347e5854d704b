#!/usr/bin/env python3
"""Many concurrent streams on one chip (or a CPU mesh) — the pattern
behind bench.py and the ≥256-streams-per-chip north star.

The functional core (init_fn, step_fn) goes through
vmap(streams) · lax.scan(frames) · shard_map(Mesh("streams")) without
any per-stream Python. This file runs anywhere; on a multi-chip TPU
slice the same code shards streams across all chips.

Run: python examples/multistream_tpu.py [--cpu] [--streams 64]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N = args.streams, args.frames, 8
    cfg = ByteTrackConfig(max_tracks=16, max_dets=N)
    init_fn, step_fn = make_bytetrack(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=S)

    # synthetic constant-velocity scenes, 4 objects per stream
    rng = np.random.default_rng(0)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    cx = rng.uniform(200, 1700, (S, 4)).astype(np.float32)
    cy = rng.uniform(200, 900, (S, 4)).astype(np.float32)
    v = rng.uniform(-5, 5, (S, 4)).astype(np.float32)
    for t in range(T):
        cx = cx + v
        dets[t, :, :4, 0] = cx - 40
        dets[t, :, :4, 1] = cy - 90
        dets[t, :, :4, 2] = cx + 40
        dets[t, :, :4, 3] = cy + 90
        dets[t, :, :4, 4] = 0.9
        masks[t, :, :4] = True

    outs, out_masks = runner.run(jnp.asarray(dets), jnp.asarray(masks))
    jax.block_until_ready(outs)
    n_emit = int(np.asarray(out_masks).sum())
    print(
        f"{S} streams x {T} frames on {len(jax.devices())} device(s): "
        f"outs {outs.shape}, {n_emit} track emissions"
    )
    # per-stream results: outs[t, s] is the (K, 8) track table of
    # stream s at frame t, rows valid where out_masks[t, s]
    last = np.asarray(outs[-1, 0])[np.asarray(out_masks[-1, 0])]
    print(f"stream 0, final frame ids: {last[:, 4].astype(int).tolist()}")


if __name__ == "__main__":
    main()
