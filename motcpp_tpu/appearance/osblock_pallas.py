"""Fused OSNet block as a single Pallas TPU kernel.

Measured motivation (scripts/profile_osnet.py, TPU v5e, B=2048 bf16):
the two stage-2 OSBlocks are 60% of OSNet x1_0's runtime (45 + 43 ms
of 145 ms) and are pure HBM-bandwidth: XLA cannot fuse conv into conv,
so each of the 10 LightConv3x3s in a block round-trips its (B, 64, 32,
64) activation through HBM twice (1x1 then depthwise), plus the four
gate passes and conv3 — ~21 GB of traffic per block at B=2048 where
the algorithm needs ~4 GB (read the input once, write the output
once).

This kernel computes an ENTIRE OSBlock (reference architecture:
torchreid OSBlock; this repo: appearance/osnet.py::OSBlock) for a tile
of TB crops per grid step, holding every intermediate in VMEM:

    x1 = relu(1x1(x))                           # bottleneck, Cin -> C
    s_k = lite_k(...)  (10 LightConv3x3 chains: depths 1/2/3/4)
    x2 = gate(s_a) + gate(s_b) + gate(s_c) + gate(s_d)   # SHARED gate
    out = relu(conv3(x2) + identity-or-downsample(x))

Weights come pre-folded (appearance/quant.py::fold_osnet — BN folded
into conv kernel+bias, inference-only algebra), so the kernel is
bias+relu arithmetic only. Matmuls (the 1x1 convs, on (TB*H*W, C)
views) accumulate in f32 on the MXU; the 3x3 depthwise runs as 9
shifted multiply-adds on a zero-padded VMEM scratch, accumulated in
f32 on the VPU. Numeric parity vs the unfused folded forward is pinned
in tests/test_appearance.py (f32 exact-ish; bf16 cosine).

The reference's equivalent compute path is ONNX-Runtime CPU inference
of the exported OSNet graph (reference: src/appearance/
onnx_backend.cpp:159-223); this kernel is the TPU-native hot path
behind the same get_features contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lite-conv stream layout of an OSBlock: name -> chain of lite convs
STREAMS = (
    ("conv2a",),
    ("conv2b_0", "conv2b_1"),
    ("conv2c_0", "conv2c_1", "conv2c_2"),
    ("conv2d_0", "conv2d_1", "conv2d_2", "conv2d_3"),
)
LITE_NAMES = tuple(n for chain in STREAMS for n in chain)


def _block_weights(folded: dict, name: str, compute_dtype):
    """Collect one OSBlock's folded weights as a flat list of arrays.

    Order (must match the kernel's unpacking):
      conv1 k/b, [10x: lite conv1 k, lite dw (9, C) k, lite bias],
      gate fc1 k/b, fc2 k/b, conv3 k/b, [downsample k/b]
    1x1 kernels are stored as (Cin, Cout) matrices; biases as (1, C).
    """
    cd = compute_dtype
    out = []

    def mat(k):  # (1, 1, Cin, Cout) -> (Cin, Cout)
        k = jnp.asarray(k)  # jnp (not np): stays traceable under jit
        return k.reshape(k.shape[-2], k.shape[-1]).astype(cd)

    def vec(b):
        return jnp.asarray(b).reshape(1, -1).astype(jnp.float32)

    l = folded[f"{name}/conv1"]
    out += [mat(l["kernel"]), vec(l["bias"])]
    for ln in LITE_NAMES:
        l1 = folded[f"{name}/{ln}/conv1"]
        l2 = folded[f"{name}/{ln}/conv2"]
        kdw = jnp.asarray(l2["kernel"])  # (3, 3, 1, C)
        out += [
            mat(l1["kernel"]),
            kdw.reshape(9, kdw.shape[-1]).astype(cd),
            vec(l2["bias"]),
        ]
    for fc in ("fc1", "fc2"):
        l = folded[f"{name}/gate/{fc}"]
        out += [jnp.asarray(l["kernel"]).astype(cd), vec(l["bias"])]
    l = folded[f"{name}/conv3"]
    out += [mat(l["kernel"]), vec(l["bias"])]
    if f"{name}/downsample" in folded:
        l = folded[f"{name}/downsample"]
        out += [mat(l["kernel"]), vec(l["bias"])]
    return out


def _osblock_kernel(x_ref, *refs, H, W, TB, C, Cout, has_ds, acc_dtype):
    """One batch-tile of a full OSBlock; refs = weights then scratch."""
    w = list(refs[:-2])
    pad_ref, acc_ref = refs[-2], refs[-1]

    def take_mat():
        return w.pop(0)[:]

    def take_bias():
        return w.pop(0)[0, :].astype(jnp.float32)

    x = x_ref[:]  # (TB, H, W, Cin)
    cdt = x.dtype
    rows = TB * H * W

    def conv1x1(v, k, b, relu=True):
        flat = v.reshape(rows, v.shape[-1])
        y = jnp.dot(flat, k, preferred_element_type=jnp.float32)
        y = y + b[None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(cdt).reshape(TB, H, W, k.shape[-1])

    k1 = take_mat()
    b1 = take_bias()
    x1 = conv1x1(x, k1, b1)  # (TB, H, W, C)

    # zero the pad scratch ONCE; every lite overwrites only the interior,
    # so the 1px border stays zero across all 10 lite convs
    pad_ref[:] = jnp.zeros((TB, H + 2, W + 2, C), cdt)

    def lite(v, kp, kdw, bdw):
        # pointwise (no bias/relu) then 3x3 depthwise + bias + relu
        y = conv1x1(v, kp, jnp.zeros((C,), jnp.float32), relu=False)
        pad_ref[:, 1:H + 1, 1:W + 1, :] = y
        acc = jnp.zeros((TB, H, W, C), acc_dtype)
        for i in range(3):
            for j in range(3):
                win = pad_ref[:, i:i + H, j:j + W, :]
                acc = acc + win.astype(acc_dtype) * kdw[i * 3 + j, :].astype(
                    acc_dtype
                )
        acc = acc + bdw[None, None, None, :].astype(acc_dtype)
        return jnp.maximum(acc, 0.0).astype(cdt)

    lite_w = [(take_mat(), take_mat(), take_bias()) for _ in LITE_NAMES]
    gfc1_k, gfc1_b = take_mat(), take_bias()
    gfc2_k, gfc2_b = take_mat(), take_bias()

    def gate_into(v):
        s = jnp.mean(v.astype(jnp.float32), axis=(1, 2))  # (TB, C)
        s = jnp.dot(s.astype(cdt), gfc1_k,
                    preferred_element_type=jnp.float32) + gfc1_b[None, :]
        s = jnp.maximum(s, 0.0)
        s = jnp.dot(s.astype(cdt), gfc2_k,
                    preferred_element_type=jnp.float32) + gfc2_b[None, :]
        s = jax.nn.sigmoid(s)
        acc_ref[:] = acc_ref[:] + (
            v.astype(jnp.float32) * s[:, None, None, :].astype(jnp.float32)
        )

    acc_ref[:] = jnp.zeros((TB, H, W, C), jnp.float32)
    wi = 0
    for chain in STREAMS:
        v = x1
        for _ in chain:
            kp, kdw, bdw = lite_w[wi]
            wi += 1
            v = lite(v, kp, kdw, bdw)
        gate_into(v)

    x2 = acc_ref[:].astype(cdt)
    k3 = take_mat()
    b3 = take_bias()
    # residual add in compute dtype: each f32 copy of a stage-2 (TB, 64,
    # 32, 256) map is 2 MB/TB — two of them blow the ~16 MB VMEM budget
    # at useful tile sizes. conv1x1 already accumulates f32 on the MXU
    # and adds the bias in f32; the final add+relu in bf16 costs <0.4%
    # relative error (cosine pin in tests/test_appearance.py)
    x3 = conv1x1(x2, k3, b3, relu=False)
    if has_ds:
        kd = take_mat()
        bd = take_bias()
        ident = conv1x1(x, kd, bd, relu=False)
    else:
        ident = x
    return jnp.maximum(x3 + ident, 0.0).astype(cdt)


def osblock_fused(folded: dict, name: str, x, features: int,
                  batch_tile: int = 4, interpret: bool = False):
    """Run one OSBlock over x (B, H, W, Cin) as a fused Pallas kernel.

    folded: fold_osnet() tree; name: block prefix (e.g. "conv2_0");
    features: output channels. batch_tile crops are processed per grid
    step (VMEM-bounded; 4 fits stage 2's (64, 32) maps comfortably).
    B must be divisible by batch_tile. interpret=True runs the Pallas
    interpreter (CPU tests).
    """
    B, H, W, Cin = x.shape
    if B % batch_tile:
        raise ValueError(f"B={B} not divisible by batch_tile={batch_tile}")
    TB = batch_tile
    C = folded[f"{name}/conv1"]["kernel"].shape[-1]
    has_ds = f"{name}/downsample" in folded
    weights = _block_weights(folded, name, x.dtype)
    acc_dtype = jnp.float32

    kernel = functools.partial(
        _osblock_kernel, H=H, W=W, TB=TB, C=C, Cout=features,
        has_ds=has_ds, acc_dtype=acc_dtype,
    )

    def body(x_ref, *refs):
        out_ref = refs[len(weights)]
        scratch = refs[len(weights) + 1:]
        out_ref[:] = kernel(x_ref, *(refs[:len(weights)] + scratch))

    grid = (B // TB,)
    in_specs = [
        pl.BlockSpec((TB, H, W, Cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, H, W, features),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, features), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, H + 2, W + 2, C), x.dtype),
            pltpu.VMEM((TB, H, W, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, *weights)
    return out


# Per-stage batch tiles: VMEM-bounded for stage 2's (64, 32) maps —
# Pallas double-buffers the in/out grid blocks, so the budget per step
# is roughly 2*(in+out) + x1/x3/ident/pad/acc; TB=2 at stage 2 blew the
# 16 MB scoped limit by 4 MB (measured), TB=1 fits. Late stages have
# 4-16x smaller maps so bigger tiles keep the MXU matmul rows up.
DEFAULT_TILES = {"conv2": 1, "conv3": 4, "conv4": 8}


def forward_fused(folded: dict, x, tiles: dict | None = None,
                  interpret: bool = False):
    """Full OSNet inference with every OSBlock as one fused Pallas kernel.

    folded: appearance/quant.py::fold_osnet tree (BN folded into
    conv kernel+bias). The six OSBlocks run as fused kernels (each
    reads its input from HBM once and writes its output once — the
    unfused forward round-trips every one of a block's ~15 conv/gate
    activations through HBM); conv1/maxpool, the two 1x1+avgpool
    transitions, conv5, and the fc head stay in XLA, which already
    fuses those fine. Matches forward_folded_f32 structure exactly
    (reference compute path: ONNX-Runtime CPU inference,
    src/appearance/onnx_backend.cpp:159-223).

    x: (B, H, W, 3), B divisible by lcm of the stage tiles (pad with
    junk crops and slice — make_embed_fn_fused does). Compute dtype
    follows x.dtype (bf16 on TPU); f32 accumulation inside the kernels.
    """
    from motcpp_tpu.appearance.quant import _conv, _infer_channels

    tiles = {**DEFAULT_TILES, **(tiles or {})}
    _, c2, c3, c4 = _infer_channels(folded)

    def conv(name, v, strides=(1, 1), padding="SAME", relu=True):
        l = folded[name]
        y = _conv(v, l["kernel"], l["bias"], strides, padding)
        return jax.nn.relu(y) if relu else y

    def block(name, v, feats, tb):
        return osblock_fused(folded, name, v, feats, batch_tile=tb,
                             interpret=interpret)

    x = conv("conv1", x, strides=(2, 2), padding=((3, 3), (3, 3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x = block("conv2_0", x, c2, tiles["conv2"])
    x = block("conv2_1", x, c2, tiles["conv2"])
    x = conv("conv2_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = block("conv3_0", x, c3, tiles["conv3"])
    x = block("conv3_1", x, c3, tiles["conv3"])
    x = conv("conv3_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = block("conv4_0", x, c4, tiles["conv4"])
    x = block("conv4_1", x, c4, tiles["conv4"])
    x = conv("conv5", x)
    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    head = folded["fc_0"]
    x = x @ head["kernel"] + head["bias"]
    return jax.nn.relu(x)
