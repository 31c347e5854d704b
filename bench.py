"""Throughput benchmark: concurrent 30-FPS tracking streams per chip.

North star (BASELINE.md): >= 256 concurrent 30-FPS streams per TPU v5e
chip (>= 7,680 aggregate tracked FPS/chip), vs the reference's 1,250 FPS
single-stream SORT on an i9-13900K CPU (reference README.md Benchmarks).

Protocol: S synthetic streams with a realistic MOT17-like detection
density (~16 objects/frame, jittered boxes, births/deaths) are tracked
for T frames as one jitted scan; steady-state wall clock over R repeats
gives aggregate frames/sec, reported as streams sustainable at 30 FPS.

Default (no --tracker): benchmark ALL 9 trackers, printing one JSON line
per tracker with the flagship (ByteTrack) LAST — a single-line parse of
the output therefore lands on ByteTrack, while the full output captures
the whole scoreboard:
  {"metric": "<tracker>_streams_at_30fps_per_chip", "value": N,
   "unit": "streams_at_30fps_per_chip", "vs_baseline": N / 256}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# flagship LAST: a single-line (tail -1) parse must land on bytetrack
ALL_TRACKERS = ["sort", "ocsort", "deepocsort", "strongsort", "botsort",
                "boosttrack", "hybridsort", "ucmctrack", "bytetrack"]

# saturation points measured on TPU v5e (docs/benchmarking.md): the
# motion-light trackers saturate at S=4096, the heavier ones at S=2048
DEFAULT_STREAMS = {"sort": 4096, "bytetrack": 4096}
DEFAULT_STREAMS_OTHER = 2048


def synth_stream_dets(rng, T, S, N, n_obj=16, img_w=1920, img_h=1080):
    """Jittered constant-velocity boxes with occasional dropouts."""
    n_obj = min(n_obj, N)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    cx = rng.uniform(100, img_w - 100, (S, n_obj)).astype(np.float32)
    cy = rng.uniform(100, img_h - 100, (S, n_obj)).astype(np.float32)
    vx = rng.uniform(-5, 5, (S, n_obj)).astype(np.float32)
    vy = rng.uniform(-3, 3, (S, n_obj)).astype(np.float32)
    w = rng.uniform(40, 120, (S, n_obj)).astype(np.float32)
    h = rng.uniform(80, 240, (S, n_obj)).astype(np.float32)
    for t in range(T):
        cx = cx + vx + rng.normal(0, 1, (S, n_obj)).astype(np.float32)
        cy = cy + vy + rng.normal(0, 0.5, (S, n_obj)).astype(np.float32)
        visible = rng.random((S, n_obj)) > 0.05  # 5% dropout
        conf = rng.uniform(0.5, 1.0, (S, n_obj)).astype(np.float32)
        dets[t, :, :n_obj, 0] = cx - w / 2
        dets[t, :, :n_obj, 1] = cy - h / 2
        dets[t, :, :n_obj, 2] = cx + w / 2
        dets[t, :, :n_obj, 3] = cy + h / 2
        dets[t, :, :n_obj, 4] = conf
        masks[t, :, :n_obj] = visible
    return dets, masks


def build_tracker_fns(tracker: str, args):
    """(init_fn, step_fn) with the scoreboard configs."""
    if tracker == "sort":
        from motcpp_tpu.models.sort import SortConfig, make_sort

        cfg = SortConfig(
            min_hits=1,
            max_age=3,
            max_tracks=args.max_tracks,
            max_dets=args.max_dets,
            lap_impl=args.lap,
        )
        return make_sort(cfg)
    if tracker == "bytetrack":
        from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack

        cfg = ByteTrackConfig(
            max_tracks=args.max_tracks,
            max_dets=args.max_dets,
            lap_impl=args.lap,
        )
        return make_bytetrack(cfg)
    if tracker == "ocsort":
        from motcpp_tpu.models.ocsort import OCSortConfig, make_ocsort

        cfg = OCSortConfig(
            min_hits=1,
            max_tracks=args.max_tracks,
            max_dets=args.max_dets,
            lap_impl=args.lap,
        )
        return make_ocsort(cfg)

    factories = {
        "deepocsort": (
            "motcpp_tpu.models.deepocsort",
            "DeepOCSortConfig",
            "make_deepocsort",
            dict(min_hits=1, embedding_off=True, cmc_off=True),
        ),
        "strongsort": (
            "motcpp_tpu.models.strongsort",
            "StrongSortConfig",
            "make_strongsort",
            dict(n_init=1, gallery_cap=16),
        ),
        "botsort": (
            "motcpp_tpu.models.botsort",
            "BotSortConfig",
            "make_botsort",
            dict(with_reid=False),
        ),
        "boosttrack": (
            "motcpp_tpu.models.boosttrack",
            "BoostTrackConfig",
            "make_boosttrack",
            dict(min_hits=1),
        ),
        "hybridsort": (
            "motcpp_tpu.models.hybridsort",
            "HybridSortConfig",
            "make_hybridsort",
            dict(min_hits=1, with_reid=False),
        ),
        "ucmctrack": (
            "motcpp_tpu.models.ucmctrack",
            "UCMCConfig",
            "make_ucmctrack",
            dict(),
        ),
    }
    import importlib

    mod_name, cfg_name, make_name, extra = factories[tracker]
    if args.emb_dim > 0:
        # emb-capable configs take the embedding width; reid flags on
        if tracker in ("strongsort", "botsort", "hybridsort",
                       "deepocsort", "boosttrack"):
            extra["emb_dim"] = args.emb_dim
        if tracker in ("botsort", "hybridsort", "boosttrack"):
            extra["with_reid"] = True
        if tracker == "deepocsort":
            extra["embedding_off"] = False
    mod = importlib.import_module(mod_name)
    cfg = getattr(mod, cfg_name)(
        max_tracks=args.max_tracks,
        max_dets=args.max_dets,
        lap_impl=args.lap,
        **extra,
    )
    return getattr(mod, make_name)(cfg)


def bench_one(tracker: str, args) -> dict:
    """Benchmark one tracker; returns the JSON record."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.parallel import MultiStreamRunner

    init_fn, step_fn = build_tracker_fns(tracker, args)
    S = args.streams or DEFAULT_STREAMS.get(tracker, DEFAULT_STREAMS_OTHER)
    T, N = args.frames, args.max_dets
    rng = np.random.default_rng(0)
    dets, masks = synth_stream_dets(rng, T, S, N, n_obj=args.objects)

    import inspect

    with_embs = args.emb_dim > 0
    with_warps = bool(getattr(args, "cmc", False)) and (
        "warp" in inspect.signature(step_fn).parameters
    )
    runner = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, with_embs=with_embs,
        with_warps=with_warps,
    )
    dets_j = jnp.asarray(dets)
    masks_j = jnp.asarray(masks)
    run_kw = {}
    if with_embs:
        e = rng.normal(0, 1, (T, S, N, args.emb_dim)).astype(np.float32)
        e /= np.linalg.norm(e, axis=-1, keepdims=True) + 1e-9
        run_kw["embs"] = jnp.asarray(e)
    if with_warps:
        # small per-frame camera jitter: rotation + translation
        ang = rng.normal(0, 0.002, (T, S)).astype(np.float32)
        txy = rng.normal(0, 1.5, (T, S, 2)).astype(np.float32)
        w = np.zeros((T, S, 2, 3), np.float32)
        w[..., 0, 0] = np.cos(ang)
        w[..., 0, 1] = -np.sin(ang)
        w[..., 1, 0] = np.sin(ang)
        w[..., 1, 1] = np.cos(ang)
        w[..., :, 2] = txy
        run_kw["warps"] = jnp.asarray(w)

    # compile + warm up. NOTE: materialize a scalar, not just
    # block_until_ready — under the axon remote platform an aborted
    # computation "completes" instantly and only raises when values are
    # fetched, which silently produces nonsense timings otherwise.
    t0 = time.time()
    out = runner.run(dets_j, masks_j, **run_kw)
    emissions = int(np.asarray(out[1]).sum())
    compile_s = time.time() - t0
    print(
        f"# [{tracker}] compile+first rollout: {compile_s:.1f}s "
        f"({emissions} track emissions)",
        file=sys.stderr,
    )
    if emissions == 0:
        print("# WARNING: no tracks emitted — check inputs", file=sys.stderr)

    # steady state (reuse carry state — continuous streaming)
    t0 = time.time()
    for _ in range(args.repeats):
        out = runner.run(dets_j, masks_j, **run_kw)
        float(np.asarray(out[0][-1]).ravel()[0])  # force + validate
    dt = (time.time() - t0) / args.repeats

    frames_tracked = S * T
    agg_fps = frames_tracked / dt
    streams_at_30 = agg_fps / 30.0
    dev = jax.devices()[0]
    print(
        f"# [{tracker}] {dev.device_kind}: {agg_fps:,.0f} aggregate FPS, "
        f"{dt/T*1e3:.2f} ms/frame-batch, S={S} K={args.max_tracks} "
        f"N={args.max_dets}",
        file=sys.stderr,
    )
    return {
        "metric": f"{tracker}_streams_at_30fps_per_chip",
        "value": round(streams_at_30, 1),
        "unit": "streams_at_30fps_per_chip",
        "vs_baseline": round(streams_at_30 / 256.0, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--tracker", default="",
        choices=[""] + ALL_TRACKERS,
        help="single tracker to benchmark; default: all 9 (one JSON "
        "line each, bytetrack last)",
    )
    ap.add_argument("--all", action="store_true",
                    help="benchmark all 9 trackers (the default)")
    ap.add_argument("--streams", type=int, default=0,
                    help="stream count (0 = per-tracker saturation "
                    "default: 4096 sort/bytetrack, 2048 others)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--max-tracks", type=int, default=64)
    ap.add_argument("--max-dets", type=int, default=32)
    ap.add_argument("--objects", type=int, default=16)
    ap.add_argument("--lap", default="auction_pallas",
                    choices=["jv", "auction", "auction_pallas"],
                    help="assignment kernel (auction_pallas = fastest "
                    "measured on TPU; falls back to interpret mode on CPU)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--emb-dim", type=int, default=0,
        help="feed random unit embeddings of this dim through the "
        "sharded rollout (ReID-path benchmark; emb-capable trackers only)",
    )
    ap.add_argument(
        "--cmc", action="store_true",
        help="feed per-frame camera-jitter warps (T, S, 2, 3) through "
        "the rollout (CMC-application benchmark; warp-capable trackers "
        "only — ignored for the rest)",
    )
    args = ap.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the all-9 default re-runs the same
    # (S, T, K, N) shapes every invocation — cached compiles turn a
    # cold ~10-minute scoreboard into ~3 minutes
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/motcpp_jax_cache"),
        )
    except Exception:
        pass  # older jax without the persistent cache

    trackers = [args.tracker] if args.tracker else ALL_TRACKERS
    for trk in trackers:
        print(json.dumps(bench_one(trk, args)), flush=True)


if __name__ == "__main__":
    main()
