"""Per-layer OSNet timing on TPU — find where the crops/s go.

The live-ReID rows (bench.py --all) run osnet_x1_0 bf16 over 2048-crop
batches (S=128 streams x N=16 crops) and sit ~13k crops/s. This script
times each sequential piece standalone (same shapes, same dtype) so the
optimization targets are measured, not guessed.

Usage: python scripts/profile_osnet.py [--batch 2048] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=20):
    """Time `repeats` back-to-back dispatches, then fetch ONE device-side
    SCALAR inside the timed region. On the axon remote platform
    block_until_ready can return without waiting (observed: the full
    model "timed" 7.8 ms while its own pieces measured 40-70 ms), so
    the only reliable sync is a value fetch — the TPU executes enqueued
    programs in order, so fetching the last result waits for all of
    them, and a scalar keeps the tunnel transfer negligible. Fetching
    block outputs (hundreds of MB) instead stalls seconds-to-minutes."""
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))  # warm-up sync (also compiles)
    t0 = time.time()
    for _ in range(repeats):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))  # in-loop sync: waits for ALL queued repeats
    dt = (time.time() - t0) / repeats * 1000.0  # ms
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 128))
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--dw-impl", default="conv", choices=["conv", "shift"],
                    help="depthwise schedule: XLA grouped conv vs "
                    "unrolled shift-FMA stencil (DepthwiseShift3x3)")
    ap.add_argument("--fused", action="store_true",
                    help="A/B the fused-OSBlock Pallas forward "
                    "(appearance/osblock_pallas.py) against the "
                    "standard apply at the same batch/dtype")
    ap.add_argument("--roofline", action="store_true",
                    help="speed-of-light adjudication: pull flops + "
                    "bytes-accessed from the compiled XLA cost model "
                    "and compare the measured time against the compute "
                    "and HBM-bandwidth rooflines")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="device peak bf16 TFLOP/s (v5e default)")
    ap.add_argument("--peak-gbps", type=float, default=819.0,
                    help="device peak HBM GB/s (v5e default)")
    args = ap.parse_args()

    from motcpp_tpu.appearance.osnet import (
        ConvBNReLU,
        OSBlock,
        init_params,
        osnet_x1_0,
    )

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.batch
    H, W = args.hw
    rng = jax.random.PRNGKey(0)

    def cast(vs):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, vs)

    rows = []

    def bench_mod(label, mod, in_shape, n=1):
        x = jax.random.normal(rng, (B,) + in_shape, dt)
        vs = cast(mod.init(rng, x[:1].astype(jnp.float32), train=False))
        f = jax.jit(lambda v, a: mod.apply(v, a, train=False))
        ms = timeit(f, vs, x, repeats=args.repeats)
        rows.append((label, ms * n, n))
        return ms

    # full model first (the ground truth)
    model = osnet_x1_0(dw_impl=args.dw_impl)
    vs = cast(init_params(model, (H, W)))
    x_full = jax.random.normal(rng, (B, H, W, 3), dt)
    f_full = jax.jit(lambda v, a: model.apply(v, a, train=False))
    full_ms = timeit(f_full, vs, x_full, repeats=args.repeats)
    print(f"full osnet_x1_0 [{args.dw_impl}] {args.dtype} B={B} {H}x{W}: "
          f"{full_ms:.2f} ms  ({B / full_ms * 1000:,.0f} crops/s)")

    if args.fused:
        # fused-OSBlock Pallas forward (appearance/osblock_pallas.py):
        # A/B against the standard apply at identical B/dtype, plus a
        # cosine check so a fast-but-wrong kernel can't masquerade
        from motcpp_tpu.appearance.osblock_pallas import forward_fused
        from motcpp_tpu.appearance.quant import fold_osnet

        folded = fold_osnet(
            jax.device_get(init_params(model, (H, W))))
        folded = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dt)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
            folded)
        f_fused = jax.jit(lambda tree, a: forward_fused(tree, a))
        fused_ms = timeit(f_fused, folded, x_full, repeats=args.repeats)
        print(f"fused osnet_x1_0 {args.dtype} B={B}: {fused_ms:.2f} ms "
              f"({B / fused_ms * 1000:,.0f} crops/s)  "
              f"{full_ms / fused_ms:.2f}x vs apply")
        a = np.asarray(f_full(vs, x_full[:64]), np.float32)
        b = np.asarray(f_fused(folded, x_full[:64]), np.float32)
        cos = (a * b).sum(1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9)
        print(f"  cosine vs apply: min {cos.min():.5f} mean {cos.mean():.5f}")

    if args.roofline:
        # Speed-of-light adjudication (VERDICT r4 #3): the compiled
        # program's own cost model says how many FLOPs it executes and
        # how many HBM bytes it touches. SoL time = max(flops/peak,
        # bytes/bw); measured/SoL is the fraction of the roofline this
        # forward achieves. A depthwise-heavy net like OSNet is
        # *designed* to be FLOP-light, so the binding roofline is
        # expected to be bandwidth (or, below that, the VPU-bound
        # depthwise stencils that neither roofline models).
        ca = (jax.jit(lambda v, a: model.apply(v, a, train=False))
              .lower(vs, x_full).compile().cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        t_flops = flops / (args.peak_tflops * 1e12) * 1e3   # ms
        t_bytes = byts / (args.peak_gbps * 1e9) * 1e3       # ms
        sol = max(t_flops, t_bytes)
        bound = "compute" if t_flops > t_bytes else "bandwidth"
        print(f"roofline: {flops / B / 1e9:.3f} GFLOP/crop, "
              f"{byts / B / 1e6:.2f} MB HBM/crop (XLA cost model)")
        print(f"  compute SoL {t_flops:.2f} ms | bandwidth SoL "
              f"{t_bytes:.2f} ms -> binding roofline: {bound}")
        print(f"  measured {full_ms:.2f} ms = {sol / full_ms * 100:.0f}% "
              f"of {bound} speed-of-light "
              f"({args.peak_tflops:g} TFLOP/s, {args.peak_gbps:g} GB/s)")

    # pieces (shapes for 256x128 input)
    h2, w2 = H // 4, W // 4      # after conv1 s2 + maxpool s2: 64x32
    bench_mod("conv1 7x7/2 (3->64ch)",
              ConvBNReLU(64, (7, 7), strides=(2, 2),
                         padding=((3, 3), (3, 3))), (H, W, 3))
    bench_mod("OSBlock s2 (64->256, 64x32)", OSBlock(256, dw_impl=args.dw_impl), (h2, w2, 64))
    bench_mod("OSBlock s2b (256->256)", OSBlock(256, dw_impl=args.dw_impl), (h2, w2, 256))
    bench_mod("OSBlock s3 (256->384, 32x16)",
              OSBlock(384, dw_impl=args.dw_impl), (h2 // 2, w2 // 2, 256))
    bench_mod("OSBlock s3b (384->384)", OSBlock(384, dw_impl=args.dw_impl),
              (h2 // 2, w2 // 2, 384))
    bench_mod("OSBlock s4 (384->512, 16x8)",
              OSBlock(512, dw_impl=args.dw_impl), (h2 // 4, w2 // 4, 384))
    bench_mod("OSBlock s4b (512->512)", OSBlock(512, dw_impl=args.dw_impl),
              (h2 // 4, w2 // 4, 512))

    print()
    total = sum(ms for _, ms, _ in rows)
    for label, ms, n in rows:
        note = f" (x{n})" if n > 1 else ""
        print(f"  {label:40s} {ms:7.2f} ms{note}  "
              f"{ms / full_ms * 100:5.1f}% of full")
    print(f"  {'sum of standalone pieces':40s} {total:7.2f} ms  "
          f"({total / full_ms * 100:.0f}% of full — gaps = transitions, "
          f"pools, head, fusion wins)")


if __name__ == "__main__":
    main()
