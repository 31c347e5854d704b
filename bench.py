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


def _time_rollout(runner, args, label, run_args, run_kw):
    """One timing protocol for every row: compile+warmup rollout, then
    args.repeats steady-state rollouts.

    Returns (dt_per_rollout_s, emissions). Validation vs timing split:
    under the axon remote platform an aborted computation "completes"
    instantly and only raises when values are fetched — but host->
    device FETCHES through the tunnel have multi-second (observed up
    to minutes) first-touch tail latency, so fetching inside the timed
    loop measures the tunnel, not the chip. Each timed repeat therefore
    only block_until_ready()s; ONE validating fetch after the loop
    raises if any repeat was silently aborted (timings are then moot
    because the raise aborts the row)."""
    import jax

    t0 = time.time()
    out = runner.run(*run_args, **run_kw)
    emissions = int(np.asarray(out[1]).sum())
    compile_s = time.time() - t0
    print(
        f"# [{label}] compile+first rollout: {compile_s:.1f}s "
        f"({emissions} track emissions)",
        file=sys.stderr,
    )
    if emissions == 0:
        print("# WARNING: no tracks emitted — check inputs", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.repeats):
        out = runner.run(*run_args, **run_kw)
        jax.block_until_ready(out)
    # the validating fetch sits INSIDE the timed region: on the axon
    # platform block_until_ready can return without waiting (observed
    # on plain jitted fns; scan rollouts have measured correctly, but a
    # dispatch-only timing must be structurally impossible in the
    # committed artifact). The TPU runs enqueued programs in order, so
    # this one scalar fetch waits for every queued repeat; its tunnel
    # cost (~ms) is amortized over args.repeats.
    float(np.asarray(out[0][-1]).ravel()[0])
    dt = (time.time() - t0) / args.repeats
    return dt, emissions


def bench_one(tracker: str, args, overrides: dict | None = None,
              metric_suffix: str = "") -> dict:
    """Benchmark one tracker; returns the JSON record.

    overrides: per-row {streams, max_tracks, max_dets, objects} for the
    capacity-scaling rows (VERDICT r2 #4 — the reference pre-allocates
    200-cap track buffers, bytetrack.hpp:128-136, and the vendored
    MOT17-04 det file peaks at 34 detections/frame, so the headline
    must be quoted at a reference-shaped capacity, not just K=64/N=32).
    """
    import copy

    if overrides:
        args = copy.copy(args)
        for k, v in overrides.items():
            setattr(args, k, v)
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.parallel import MultiStreamRunner

    init_fn, step_fn = build_tracker_fns(tracker, args)
    # live-CMC rows carry a (T, S, h, w) frame tensor on device; cap S
    # so it stays a few GB of HBM (the tracker state is tiny beside it)
    cmc_live = str(getattr(args, "cmc", "") or "") in ("ecc", "sof")
    S = args.streams or (
        512 if cmc_live else DEFAULT_STREAMS.get(tracker, DEFAULT_STREAMS_OTHER)
    )
    T, N = args.frames, args.max_dets
    rng = np.random.default_rng(0)
    dets, masks = synth_stream_dets(rng, T, S, N, n_obj=args.objects)

    import inspect

    with_embs = args.emb_dim > 0
    cmc_mode = str(getattr(args, "cmc", "") or "")
    warp_capable = "warp" in inspect.signature(step_fn).parameters
    with_warps = cmc_mode == "warps" and warp_capable
    cmc_fn = None
    cmc_scale = 0.15  # the reference's CMC preprocessing scale
    if cmc_mode in ("ecc", "sof") and warp_capable:
        # LIVE in-graph CMC: per-frame grayscale at the reference's
        # 0.15x preprocess scale (cmc.cpp:8-26) through ecc_jax_batch /
        # sof_jax_batch inside the scanned program — the reference runs
        # cv2 per frame per tracker on the host (ecc.cpp:22-98)
        from motcpp_tpu.motion.cmc import ecc_jax_batch, sof_jax_batch

        cmc_fn = ecc_jax_batch if cmc_mode == "ecc" else sof_jax_batch
    runner = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, with_embs=with_embs,
        with_warps=with_warps, cmc_fn=cmc_fn, cmc_scale=cmc_scale,
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
    if cmc_fn is not None:
        # per-stream panning textured frames, generated ON DEVICE (a
        # (T, S, h, w) host tensor would ride the tunnel for minutes):
        # multi-scale noise textures panned by a per-stream velocity
        fh, fw = int(1080 * cmc_scale), int(1920 * cmc_scale)
        pans = rng.integers(0, 4, S)  # px/frame at CMC scale
        wide = fw + int(pans.max()) * T
        tex = jnp.zeros((S, fh, wide), jnp.float32)
        key = jax.random.PRNGKey(0)
        for blk in (8, 16, 32):
            k1, key = jax.random.split(key)
            small = jax.random.uniform(
                k1, (S, fh // blk + 1, wide // blk + 1), jnp.float32
            )
            up = jnp.repeat(jnp.repeat(small, blk, 1), blk, 2)
            tex = tex + up[:, :fh, :wide]
        tex = tex / 3.0 * 255.0
        pans_j = jnp.asarray(pans, jnp.int32)

        @jax.jit
        def make_frames(tex):
            def frame_t(t):
                def one(s):
                    return jax.lax.dynamic_slice(
                        tex[s], (0, pans_j[s] * t), (fh, fw)
                    )
                return jax.vmap(one)(jnp.arange(S))
            return jax.vmap(frame_t)(jnp.arange(T))

        run_kw["frames"] = make_frames(tex).block_until_ready()

    # steady state reuses carry state — continuous streaming
    dt, _ = _time_rollout(
        runner, args, f"{tracker}{metric_suffix}", (dets_j, masks_j), run_kw
    )

    frames_tracked = S * T
    agg_fps = frames_tracked / dt
    streams_at_30 = agg_fps / 30.0
    dev = jax.devices()[0]
    print(
        f"# [{tracker}{metric_suffix}] {dev.device_kind}: "
        f"{agg_fps:,.0f} aggregate FPS, "
        f"{dt/T*1e3:.2f} ms/frame-batch, S={S} K={args.max_tracks} "
        f"N={args.max_dets}"
        + (f" cmc={cmc_mode}" if cmc_mode else ""),
        file=sys.stderr,
    )
    return {
        "metric": f"{tracker}{metric_suffix}_streams_at_30fps_per_chip",
        "value": round(streams_at_30, 1),
        "unit": "streams_at_30fps_per_chip",
        "vs_baseline": round(streams_at_30 / 256.0, 3),
    }


# capacity-scaling rows: (suffix, overrides). K128/N64 covers the
# MOT17-04 detection peak (34/frame) with headroom; K128/N128 is the
# golden/accuracy-run shape (tests/golden use K=N=128); S reduced to
# bound row time, the metric normalizes to per-stream throughput.
CAPACITY_ROWS = [
    ("_K128_N64", dict(streams=1024, max_tracks=128, max_dets=64,
                       objects=40)),
    ("_K128_N128", dict(streams=1024, max_tracks=128, max_dets=128,
                        objects=64)),
]
CAPACITY_TRACKERS = ["strongsort", "boosttrack", "bytetrack"]

# deployed live-ReID operating point per tracker: the cheapest CNN
# load whose measured HOTA cost on the 600-frame ablation scene is
# <=1.0 vs every-frame embedding (tests/accuracy_cadence.json +
# tests/accuracy_budget.json; methodology in docs/benchmarking.md).
# BotSORT/DeepOC-SORT ride their EMA banks flat to cadence k=8;
# BoostTrack is flat to k=2. StrongSORT pays 3.2 HOTA at cadence k=2
# but only 0.64 at a PRIORITY budget of 0.6 (novelty/crowding/rotation
# selection, parallel.streams.embedding_priority), so it deploys
# priority-0.6; HybridSORT's TCM pays 5 HOTA at cadence k=2 but only
# 0.73 at a priority budget of 0.8. The CNN runs bf16 BN-folded (the fastest measured
# configuration on this stack; int8 measured SLOWER than bf16 -- see
# appearance/quant.py and docs/benchmarking.md).
DEPLOYED = {
    "strongsort": ["--emb-priority", "0.6"],
    "botsort": ["--emb-cadence", "8"],
    "deepocsort": ["--emb-cadence", "8"],
    "boosttrack": ["--emb-cadence", "2"],
    "hybridsort": ["--emb-priority", "0.8"],
}


def bench_livereid(tracker: str, args) -> dict:
    """Images-in -> tracks-out: raw 256x128 uint8 crops through the
    in-graph OSNet (bfloat16) into the tracker, the serving
    live-ReID path (VERDICT r2 #3). The reference's equivalent path is
    ONNX-Runtime CPU inference inside update()
    (onnx_backend.cpp:110-223); here the CNN and the tracker step are
    one fused XLA program per frame-batch. --reid-variant selects the
    backbone width (the reference's export script supports the same
    osnet_x* family, scripts/export_reid_onnx.py:15-50). --crop-budget
    caps the CNN batch at the given per-frame crop count: only the
    highest-confidence valid crops are embedded (appearance.reid.
    embed_valid_crops) — det slots are capacity, the budget is load."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.appearance import osnet as osnet_mod
    from motcpp_tpu.appearance.osnet import init_params
    from motcpp_tpu.appearance.reid import make_embed_fn
    from motcpp_tpu.parallel import MultiStreamRunner

    variant = getattr(args, "reid_variant", "x1_0")
    hw, D = (256, 128), 512
    S = min(128, args.streams) if args.streams else 128
    T, N, K = 4, 16, 64
    model = getattr(osnet_mod, f"osnet_{variant}")(
        feature_dim=D, dw_impl=getattr(args, "dw_impl", "conv"))
    variables = init_params(model, hw, seed=0)
    # bf16 rides the MXU at its native 16-bit rate on TPU; on CPU it is
    # software-emulated and ~100x slower, so fall back to f32 there
    cdt = "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"
    if getattr(args, "reid_quant", False):
        # int8 weights + static activation scales: the MXU runs int8 at
        # 2x the bf16 rate and activations halve HBM traffic
        # (appearance/quant.py; cosine-parity pinned in
        # tests/test_appearance.py::TestQuantizedInference)
        from motcpp_tpu.appearance.quant import make_embed_fn_int8

        embed = make_embed_fn_int8(model, variables)
        cdt = "int8"
    else:
        embed = make_embed_fn(model, variables, compute_dtype=cdt,
                              folded=cdt == "bfloat16")

    import copy

    budget = int(getattr(args, "crop_budget", 0) or 0)
    if budget:
        # capacity-vs-load decoupling: size the det axis for peaks, pay
        # the CNN only for the budget
        N = max(N, 32)
    cadence = int(getattr(args, "emb_cadence", 0) or 0)
    pri_frac = float(getattr(args, "emb_priority", 0.0) or 0.0)
    if pri_frac:
        # priority-budgeted embedding: the CNN batch is a fixed
        # fraction of the det slots, filled by novelty/crowding/
        # rotation score (parallel.streams.embedding_priority) — the
        # deployed operating point for the cadence-sensitive trackers
        # (accuracy cost measured in tests/accuracy_budget.json)
        cadence = 0
        budget = max(budget or 0, int(round(pri_frac * S * N)))
    a = copy.copy(args)
    a.max_tracks, a.max_dets, a.emb_dim = K, N, D
    init_fn, step_fn = build_tracker_fns(tracker, a)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                               embed_fn=embed,
                               crop_budget=budget or None,
                               emb_cadence=cadence or None,
                               emb_priority=bool(pri_frac))
    rng = np.random.default_rng(0)
    dets, masks = synth_stream_dets(rng, T, S, N, n_obj=14)
    dets_j = jnp.asarray(dets)
    masks_j = jnp.asarray(masks)
    # generate ONE frame of crops on the host and tile the time axis on
    # device (rolled along the stream axis so frames differ): the full
    # (T, S, N, 256, 128, 3) tensor is ~0.8 GB — generating and
    # tunnel-transferring it from the host dominates the row's wall
    # clock on a small host, while the CNN cost being measured is
    # identical either way
    crops0 = jnp.asarray(
        rng.integers(0, 255, (S, N) + hw + (3,)).astype(np.uint8)
    )
    crops_j = jnp.stack(
        [jnp.roll(crops0, t, axis=0) for t in range(T)]
    ).block_until_ready()

    dt, _ = _time_rollout(
        runner, args, f"{tracker}_livereid", (dets_j, masks_j),
        {"embs": crops_j},
    )
    agg_fps = S * T / dt
    streams_at_30 = agg_fps / 30.0
    crops_per_frame = budget or S * N
    if cadence > 1:
        # the gate embeds ceil(S/k) streams' crops per frame
        crops_per_frame = min(crops_per_frame, -(-S // cadence) * N)
    crops_per_s = crops_per_frame * T / dt
    dev = jax.devices()[0]
    print(
        f"# [{tracker}_livereid] {dev.device_kind}: {agg_fps:,.0f} "
        f"aggregate FPS ({crops_per_s:,.0f} crops/s through OSNet {variant} "
        f"{cdt}), {dt/T*1e3:.2f} ms/frame-batch, S={S} K={K} N={N} "
        f"crop={hw[0]}x{hw[1]}"
        + (f" budget={budget}" if budget else "")
        + (f" cadence={cadence}" if cadence > 1 else ""),
        file=sys.stderr,
    )
    return {
        "metric": f"{tracker}_livereid"
        + ("" if variant == "x1_0" else f"_{variant}")
        + ("_int8" if cdt == "int8" else "")
        + (f"_pb{pri_frac}" if pri_frac else (f"_cb{budget}" if budget else ""))
        + (f"_ec{cadence}" if cadence > 1 else "")
        + "_streams_at_30fps_per_chip",
        "value": round(streams_at_30, 1),
        "unit": "streams_at_30fps_per_chip",
        # vs_baseline keeps the scoreboard-wide ">=256 streams" target
        # for comparability; the reference's own images-in pipeline
        # (StrongSORT + ONNX ReID, BASELINE.md: 95 FPS on i9-13900K
        # ~= 3.2 streams@30FPS) is the like-for-like ratio below
        "vs_baseline": round(streams_at_30 / 256.0, 3),
        "aggregate_fps": round(agg_fps, 1),
        "vs_ref_reid_pipeline": round(agg_fps / 95.0, 1),
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
    ap.add_argument("--quick", action="store_true",
                    help="base 9 rows only (skip capacity + live-ReID rows)")
    ap.add_argument(
        "--emb-dim", type=int, default=0,
        help="feed random unit embeddings of this dim through the "
        "sharded rollout (ReID-path benchmark; emb-capable trackers only)",
    )
    ap.add_argument(
        "--reid-variant", default="x1_0",
        choices=["x1_0", "x0_75", "x0_5", "x0_25"],
        help="OSNet width for the live-ReID rows (same family the "
        "reference exports via scripts/export_reid_onnx.py)",
    )
    ap.add_argument(
        "--dw-impl", default="conv", choices=["conv", "shift"],
        help="OSNet depthwise schedule for the live-ReID rows "
        "(scripts/profile_osnet.py A/Bs them; same numerics either way)",
    )
    ap.add_argument(
        "--crop-budget", type=int, default=0,
        help="cap the live-ReID CNN batch at this many crops per frame "
        "(highest-confidence valid crops; 0 = embed every det slot). "
        "Widens the det axis to N>=32 to demonstrate capacity-vs-load "
        "decoupling",
    )
    ap.add_argument(
        "--reid-quant", action="store_true",
        help="run the live-ReID CNN int8-quantized (appearance/quant.py: "
        "BN-folded, per-channel int8 weights, static activation scales; "
        "parity pinned in tests). ~2x MXU rate + half the activation "
        "HBM traffic vs bfloat16",
    )
    ap.add_argument(
        "--emb-priority", type=float, default=0.0,
        help="live-ReID priority-budgeted embedding: embed only this "
        "fraction of det slots per frame, chosen by novelty/crowding/"
        "rotation score (parallel.streams.embedding_priority; accuracy "
        "cost in tests/accuracy_budget.json). Replaces --emb-cadence. "
        "0 = off",
    )
    ap.add_argument(
        "--emb-cadence", type=int, default=0,
        help="live-ReID embedding cadence k: embed each stream's crops "
        "only every k-th frame (staggered round-robin; the CNN batch "
        "shrinks ~k x while track features ride the EMA/gallery). "
        "0/1 = embed every frame",
    )
    ap.add_argument(
        "--livereid", action="store_true",
        help="with --tracker: run that tracker's live-ReID row (crops "
        "through the in-graph CNN) instead of the precomputed-embs row — "
        "the single-row A/B mode for --reid-quant/--emb-cadence/"
        "--reid-variant experiments",
    )
    ap.add_argument(
        "--merge-full", action="store_true",
        help="single-tracker mode: merge this run's row into "
        "BENCH_FULL.json by metric key (replaces the matching row, "
        "appends if absent) — re-measure one contention-suspect leg "
        "without re-running the whole scoreboard",
    )
    ap.add_argument(
        "--metric-suffix", default="",
        help="suffix appended to the metric name in single-tracker "
        "mode (used by the full scoreboard's subprocess legs to "
        "reproduce suffixed rows like _cmc_ecc)",
    )
    ap.add_argument(
        "--cmc", nargs="?", const="warps", default="",
        choices=["", "warps", "ecc", "sof"],
        help="CMC leg: 'warps' feeds precomputed per-frame camera-jitter "
        "warps (T, S, 2, 3) through the rollout (CMC-application "
        "benchmark); 'ecc'/'sof' run LIVE in-graph estimation "
        "(motion.cmc.ecc_jax_batch / sof_jax_batch) from 0.15x-scale "
        "grayscale frames generated on device — the full "
        "frames-to-warps-to-tracker path the reference runs per frame "
        "on the host (ecc.cpp:22-98). Warp-capable trackers only",
    )
    args = ap.parse_args()

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the all-9 default re-runs the same
    # (S, T, K, N) shapes every invocation — cached compiles turn a
    # cold ~10-minute scoreboard into seconds per row
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/motcpp_jax_cache")
    # a bench killed mid-compile can leave partial entries that WEDGE
    # later cache lookups on the axon platform (observed round 3: a
    # poisoned dir hung every capacity-row compile >560s; a fresh dir
    # compiled in 121s and hit in 2s) — sweep leftovers at startup
    from pathlib import Path

    try:
        entries = list(Path(cache_dir).glob("*"))
    except OSError:
        entries = []
    for p in entries:
        # per-entry guard: a concurrent bench renaming its own entry
        # away mid-sweep must not abort the rest of the sweep
        try:
            if p.suffix == ".tmp" or p.stat().st_size == 0:
                p.unlink(missing_ok=True)
        except OSError:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass  # older jax without the persistent cache

    # full-scoreboard runs also persist every row to BENCH_FULL.json
    # next to this file: the driver's evidence artifact keeps only a
    # stdout tail (ADVICE r3), so the full scoreboard must persist
    # somewhere inspectable. Single-row runs do NOT write it (ADVICE
    # r4: a one-row run must not clobber the full-scoreboard artifact).
    rows = []

    def emit(rec):
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    def emit_subprocess(extra_argv, label, timeout_s=2400):
        """Run one risky row in a FRESH process and emit its JSON line.

        BENCH_r04 was rc=1: a TPU worker kernel fault inside the live
        in-graph ECC leg killed the process and every row scheduled
        after it. Risky legs (live CMC, live ReID — anything carrying
        new in-graph kernels) therefore run isolated: a crash costs one
        row (recorded as an error entry in BENCH_FULL.json), never the
        artifact, and the next leg reconnects on a fresh worker."""
        import subprocess

        cmd = [sys.executable, __file__,
               "--frames", str(args.frames),
               "--repeats", str(args.repeats),
               "--lap", args.lap] + extra_argv
        if args.cpu:
            cmd.append("--cpu")
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout_s
            )
        except subprocess.TimeoutExpired:
            print(f"# [{label}] LEG TIMED OUT after {timeout_s}s — "
                  "skipped", file=sys.stderr, flush=True)
            rows.append({"metric": label, "error": f"timeout {timeout_s}s"})
            return
        for line in proc.stderr.splitlines():
            if line.startswith("#"):
                print(line, file=sys.stderr, flush=True)
        rec = None
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    pass
        if proc.returncode != 0 or rec is None:
            tail = "\n".join(proc.stderr.splitlines()[-3:])
            print(f"# [{label}] LEG FAILED rc={proc.returncode}: {tail}",
                  file=sys.stderr, flush=True)
            rows.append({"metric": label,
                         "error": f"rc={proc.returncode}: {tail[-300:]}"})
            return
        emit(rec)

    try:
        if args.tracker:
            if args.livereid:
                emit(bench_livereid(args.tracker, args))
            else:
                emit(bench_one(args.tracker, args, None, args.metric_suffix))
            return
        # full scoreboard: 8 trackers, capacity rows, live-ReID rows,
        # then the flagship (ByteTrack base row) LAST for single-line
        # parsing
        for trk in ALL_TRACKERS[:-1]:
            emit(bench_one(trk, args))
        if not args.quick:
            for suffix, ov in CAPACITY_ROWS:
                for trk in CAPACITY_TRACKERS:
                    row = dict(ov)
                    if args.streams:  # explicit -S caps capacity rows too
                        row["streams"] = min(row["streams"], args.streams)
                    emit(bench_one(trk, args, row, suffix))
            # all five appearance trackers get a live-ReID row (the
            # reference serves all five through its ONNX backend,
            # onnx_backend.cpp:110-133). One row keeps the raw
            # every-frame bf16 path (like-for-like vs the reference,
            # which embeds every frame); the five-tracker sweep runs
            # each tracker's DEPLOYED operating point — int8 CNN +
            # the largest embedding cadence whose measured HOTA cost
            # on the 600-frame ablation scene is <=1.0
            # (tests/accuracy_cadence.json, docs/benchmarking.md) —
            # unless --emb-cadence/--reid-quant override. All of these
            # legs run in subprocesses (see emit_subprocess).
            #
            # live-CMC row: frames -> ecc_jax_batch -> warps -> tracker,
            # all in-graph (ECC is StrongSORT's default CMC; the
            # reference runs it per frame on the host, ecc.cpp:22-98)
            emit_subprocess(
                ["--tracker", "strongsort", "--cmc", "ecc",
                 "--streams", "512", "--metric-suffix", "_cmc_ecc"],
                "strongsort_cmc_ecc",
            )
            emit_subprocess(
                ["--tracker", "strongsort", "--livereid",
                 "--emb-cadence", "1"],
                "strongsort_livereid_bf16_everyframe",
            )
            for trk, dep in DEPLOYED.items():
                emit_subprocess(
                    ["--tracker", trk, "--livereid"] + dep,
                    f"{trk}_livereid_deployed",
                )
        emit(bench_one("bytetrack", args))
    finally:
        if rows and args.tracker and args.merge_full and not args.cpu:
            from pathlib import Path

            out = Path(__file__).resolve().parent / "BENCH_FULL.json"
            try:
                full = json.loads(out.read_text())
            except (OSError, json.JSONDecodeError):
                full = {"rows": [], "argv": []}
            for rec in rows:
                for i, old in enumerate(full["rows"]):
                    if old.get("metric") == rec.get("metric"):
                        full["rows"][i] = rec
                        break
                else:
                    full["rows"].append(rec)
            out.write_text(json.dumps(full, indent=1) + "\n")
        if rows and not args.tracker:
            from pathlib import Path

            # --quick/--cpu scoreboards are smoke runs: keep them out of
            # the driver-grade artifact (a CPU --quick run once clobbered
            # the committed TPU scoreboard, ADVICE r4)
            name = ("BENCH_QUICK.json" if (args.quick or args.cpu)
                    else "BENCH_FULL.json")
            out = Path(__file__).resolve().parent / name
            out.write_text(
                json.dumps({"rows": rows, "argv": sys.argv[1:]}, indent=1)
                + "\n"
            )


if __name__ == "__main__":
    main()
