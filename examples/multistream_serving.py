#!/usr/bin/env python3
"""Multi-stream serving example — the TPU scaling axis.

Tracks S independent video streams as one sharded computation: state is
carried between calls, so this is the shape of a production serving
loop (ingest a batch of frames for all streams, run one rollout,
repeat). On a multi-chip mesh the stream axis shards automatically.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N, K = 64, 30, 16, 32  # streams, frames/chunk, dets, slots
    print(f"Serving {S} streams on {jax.device_count()} device(s), "
          f"backend={jax.default_backend()}")

    cfg = ByteTrackConfig(max_tracks=K, max_dets=N, lap_impl="auction")
    init_fn, step_fn = make_bytetrack(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=S)

    rng = np.random.default_rng(0)

    def next_chunk(t0):
        """Stand-in for a real ingest: 8 moving objects per stream."""
        dets = np.zeros((T, S, N, 6), np.float32)
        masks = np.zeros((T, S, N), bool)
        for t in range(T):
            for i in range(8):
                x = (50 * i + 3 * (t0 + t)) % 1800
                dets[t, :, i] = [x, 100 + 40 * i, x + 70, 260 + 40 * i, 0.9, 0]
                masks[t, :, i] = True
        return dets, masks

    for chunk in range(3):
        dets, masks = next_chunk(chunk * T)
        t0 = time.time()
        outs, out_masks = runner.run(dets, masks)
        n = int(np.asarray(out_masks).sum())
        dt = time.time() - t0
        label = "compile+run" if chunk == 0 else "run"
        print(
            f"chunk {chunk}: {label} {dt*1000:7.1f} ms, "
            f"{n} track emissions, "
            f"{S*T/dt:,.0f} aggregate FPS"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
