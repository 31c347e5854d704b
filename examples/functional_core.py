#!/usr/bin/env python3
"""Using a tracker's pure functional core directly — for embedding a
tracker inside your own jit/scan/pjit program (e.g. fused with a JAX
detector so boxes never leave the device).

Run: python examples/functional_core.py [--cpu]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.models.ocsort import OCSortConfig, make_ocsort

    cfg = OCSortConfig(min_hits=1, max_tracks=16, max_dets=8)
    init_fn, step_fn = make_ocsort(cfg)

    # pad detections to the static capacity N=8 and mask the real rows
    def pad(rows):
        d = np.zeros((8, 6), np.float32)
        m = np.zeros((8,), bool)
        d[: len(rows)] = rows
        m[: len(rows)] = True
        return jnp.asarray(d), jnp.asarray(m)

    jit_step = jax.jit(step_fn)
    state = init_fn()
    for frame in range(1, 6):
        dets, mask = pad(
            [
                [100 + 5 * frame, 100, 200 + 5 * frame, 300, 0.9, 0],
                [500, 400 + 3 * frame, 620, 640 + 3 * frame, 0.8, 0],
            ]
        )
        state, (out, out_mask) = jit_step(state, dets, mask)
        rows = np.asarray(out)[np.asarray(out_mask)]
        print(f"frame {frame}: ids={rows[:, 4].astype(int).tolist()}")

    # the same step_fn scans over a whole clip in one XLA program:
    T = 20
    clip = jnp.stack(
        [pad([[100 + 5 * t, 100, 200 + 5 * t, 300, 0.9, 0]])[0] for t in range(T)]
    )
    clip_mask = jnp.stack(
        [pad([[0, 0, 1, 1, 0.9, 0]])[1] for _ in range(T)]
    )

    def scan_body(state, inp):
        dets, mask = inp
        state, out = step_fn(state, dets, mask)
        return state, out

    _, (outs, out_masks) = jax.lax.scan(
        jax.jit(scan_body), init_fn(), (clip, clip_mask)
    )
    print(f"scanned clip: outs {outs.shape}, emissions {int(out_masks.sum())}")


if __name__ == "__main__":
    main()
