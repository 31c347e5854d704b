#!/usr/bin/env python3
"""Asynchronous serving example — the native ingest runtime.

`multistream_serving.py` shows the synchronous shape (one pre-batched
rollout per chunk). Real deployments have independent cameras pushing
frames from their own threads at their own cadence. This example runs
the full serving stack:

  camera threads -> native C++ stream mux -> fixed-shape batch
                 -> one vmapped tracker step per tick -> per-stream rows

Streams attach and detach while the service runs; a stream that missed
a tick is frozen (masked state select), so its tracking is bit-exact vs
an uninterrupted run.
"""

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=12)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from motcpp_tpu.serving import TrackingService, native_available

    S = args.streams
    # use as many devices as the stream count divides evenly over
    n_dev = next(d for d in range(len(jax.devices()), 0, -1) if S % d == 0)
    svc = TrackingService.from_tracker(
        "bytetrack", n_streams=S, max_dets=16,
        tracker_kw=dict(max_tracks=32),
        devices=jax.devices()[:n_dev],
    )
    print(f"{S} streams over {n_dev} device(s)")
    print(f"mux backend: {'native C++' if native_available() else 'python'}")

    # --- camera threads: each feeds ~2/3 of the ticks (irregular) --------
    handles = [svc.attach() for _ in range(S)]
    stop = threading.Event()

    def camera(s):
        rng = np.random.default_rng(s)
        t = 0
        while not stop.is_set():
            if rng.random() < 0.67:
                n = int(rng.integers(2, 6))
                x = (rng.uniform(0, 1500, n) + 4 * t).astype(np.float32)
                y = rng.uniform(0, 800, n).astype(np.float32)
                dets = np.stack(
                    [x, y, x + 80, y + 180, rng.uniform(0.6, 1.0, n),
                     np.zeros(n)], axis=1,
                ).astype(np.float32)
                try:
                    svc.submit(handles[s], dets)
                except ValueError:
                    pass  # handle went stale during a live re-attach
            t += 1
            time.sleep(0.002)

    threads = [threading.Thread(target=camera, args=(s,), daemon=True)
               for s in range(S)]
    for th in threads:
        th.start()

    # --- service loop ----------------------------------------------------
    total_rows = 0
    for tick in range(args.ticks):
        batch = svc.step()  # one vmapped device step for all S slots
        rows = int(batch.out_masks.sum())
        total_rows += rows
        print(f"tick {tick:2d}: {int(batch.present.sum())}/{S} streams "
              f"present, {rows} track rows")
        if tick == args.ticks // 2:  # live detach + re-attach
            svc.detach(handles[0])
            handles[0] = svc.attach()
    stop.set()
    for th in threads:
        th.join()

    print(f"served {total_rows} track rows; stats: {svc.stats()}")
    print("async serving ok")


if __name__ == "__main__":
    main()
