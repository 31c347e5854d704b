"""Int8 quantized OSNet inference for the live-ReID serving path.

The reference serves ReID through ONNX-Runtime float32 CPU inference
(reference: src/appearance/onnx_backend.cpp:110-223). This module
quantizes the TPU inference path:

  * BatchNorm is folded into the preceding conv (inference-only
    algebra: w' = w * gamma / sqrt(var + eps), b' = beta - mean *
    gamma / sqrt(var + eps)), removing one elementwise pass per conv;
  * conv/dense weights are quantized per-OUTPUT-CHANNEL symmetric
    int8; activations per-tensor symmetric int8 with STATIC scales
    calibrated from representative crops (one calibration pass records
    per-layer max-abs). Static scales keep the graph free of
    data-dependent reductions between layers;
  * accumulation in int32 (preferred_element_type), dequantized to
    float for the nonlinearity, requantized at the next conv.

The quantized forward is a MANUAL walk of the same Flax variables tree
(appearance/osnet.py) — structure drift is pinned by
tests/test_appearance.py::test_quant_float_path_matches_flax (the f32
manual forward must match model.apply to <= 1e-4) and the int8 output
quality by a cosine-agreement pin vs the f32 embeddings.

Usage:
    model, variables = ...                      # as for ReIDBackend
    qvars = quantize_osnet(model, variables, calib_crops)
    embed = make_embed_fn_int8(model, qvars)    # crops (B,H,W,3) -> (B,D)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # flax.linen.BatchNorm default, matches torch 1e-5


# --------------------------------------------------------------- folding
def _fold_conv_bn(conv, bn):
    """Fold BN into conv: returns (kernel, bias) float32.

    conv: {"kernel": (h, w, cin_per_group, cout)}
    bn: {"scale","bias"} params + {"mean","var"} stats, all (cout,)
    """
    gamma = bn["scale"]
    beta = bn["bias"]
    mean = bn["mean"]
    var = bn["var"]
    f = gamma / jnp.sqrt(var + BN_EPS)  # (cout,)
    kernel = conv["kernel"] * f  # broadcast over last (out) axis
    bias = beta - mean * f
    return kernel.astype(jnp.float32), bias.astype(jnp.float32)


def fold_osnet(variables) -> dict:
    """Fold every Conv+BN pair of an OSNet variables tree into
    {"<path>": {"kernel","bias"}} plus unfused leaves (gate Dense).

    Layout mirrors appearance/osnet.py module names. The folded tree
    drives both the f32 manual forward (parity-pinned) and the int8
    path.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    out: dict = {}

    def walk(p_node, s_node, path):
        # mappings only (dict or flax FrozenDict); fc_1 BN folds into
        # fc_0 below
        if not hasattr(p_node, "keys") or path == ("fc_1",):
            return
        keys = set(p_node)
        if "conv" in keys and "bn" in keys:
            # ConvBNReLU
            out["/".join(path)] = dict(
                zip(("kernel", "bias"),
                    _fold_conv_bn(p_node["conv"], {**p_node["bn"],
                                                   **s_node["bn"]}))
            )
            return
        if "conv1" in keys and "conv2" in keys and "bn" in keys:
            # LiteConv3x3: conv1 (1x1, no bn) + conv2 (dw) + bn
            k1 = p_node["conv1"]["kernel"].astype(jnp.float32)
            out["/".join(path + ("conv1",))] = dict(
                kernel=k1, bias=jnp.zeros((k1.shape[-1],), jnp.float32)
            )
            out["/".join(path + ("conv2",))] = dict(
                zip(("kernel", "bias"),
                    _fold_conv_bn(p_node["conv2"], {**p_node["bn"],
                                                    **s_node["bn"]}))
            )
            return
        if "fc1" in keys and "fc2" in keys and "kernel" not in keys:
            # ChannelGate: plain Dense pair (has biases, no BN)
            for fc in ("fc1", "fc2"):
                out["/".join(path + (fc,))] = dict(
                    kernel=p_node[fc]["kernel"].astype(jnp.float32),
                    bias=p_node[fc]["bias"].astype(jnp.float32),
                )
            return
        if "kernel" in keys:  # fc_0 Dense (head), folded with fc_1 BN later
            out["/".join(path)] = dict(
                kernel=p_node["kernel"].astype(jnp.float32),
                bias=p_node.get(
                    "bias", jnp.zeros((p_node["kernel"].shape[-1],))
                ).astype(jnp.float32),
            )
            return
        for k in sorted(keys):
            walk(p_node[k],
                 s_node.get(k, {}) if hasattr(s_node, "get") else {},
                 path + (k,))

    walk(params, stats, ())

    # head: fold fc_1 BN into fc_0 Dense
    if "fc_0" in out and "fc_1" in params:
        f = params["fc_1"]["scale"] / jnp.sqrt(
            stats["fc_1"]["var"] + BN_EPS
        )
        out["fc_0"] = dict(
            kernel=out["fc_0"]["kernel"] * f,
            bias=out["fc_0"]["bias"] * f
            + params["fc_1"]["bias"] - stats["fc_1"]["mean"] * f,
        )
    return out


# --------------------------------------------------------------- forward
def _conv(x, kernel, bias, strides=(1, 1), padding="SAME", groups=1):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    # accumulate f32, carry activations in the input dtype (bf16 halves
    # the HBM traffic of this bandwidth-bound net; f32 in == f32 out)
    return (y + bias).astype(x.dtype)


def _infer_channels(folded):
    return (
        folded["conv1"]["kernel"].shape[-1],
        folded["conv2_2_0"]["kernel"].shape[-1],
        folded["conv3_2_0"]["kernel"].shape[-1],
        folded["conv5"]["kernel"].shape[-1],
    )


def _forward_folded(folded, x, qget=None):
    """OSNet forward over the folded tree (f32 unless qget is given).

    qget(name, x, strides, padding, groups): quantized conv hook — when
    provided, every conv/dense routes through it; otherwise _conv.
    Mirrors appearance/osnet.py::OSNet.__call__ exactly (structure
    parity pinned in tests/test_appearance.py).
    """

    def conv(name, x, strides=(1, 1), padding="SAME", groups=1, relu=True):
        l = folded[name]
        if qget is not None:
            y = qget(name, x, strides, padding, groups)
        else:
            y = _conv(x, l["kernel"], l["bias"], strides, padding, groups)
        return jax.nn.relu(y) if relu else y

    def lite(name, x):
        x = conv(f"{name}/conv1", x, relu=False)
        c = folded[f"{name}/conv2"]["kernel"].shape[-1]
        return conv(f"{name}/conv2", x, padding=((1, 1), (1, 1)), groups=c)

    def gate(name, x):
        s = jnp.mean(x, axis=(1, 2))
        l1 = folded[f"{name}/fc1"]
        s = jax.nn.relu(s @ l1["kernel"] + l1["bias"])
        l2 = folded[f"{name}/fc2"]
        s = jax.nn.sigmoid(s @ l2["kernel"] + l2["bias"])
        return x * s[:, None, None, :]

    def osblock(name, x, features):
        identity = x
        x1 = conv(f"{name}/conv1", x)
        x2a = lite(f"{name}/conv2a", x1)
        x2b = lite(f"{name}/conv2b_1", lite(f"{name}/conv2b_0", x1))
        x2c = lite(f"{name}/conv2c_2",
                   lite(f"{name}/conv2c_1", lite(f"{name}/conv2c_0", x1)))
        x2d = lite(f"{name}/conv2d_3",
                   lite(f"{name}/conv2d_2",
                        lite(f"{name}/conv2d_1", lite(f"{name}/conv2d_0", x1))))
        g = functools.partial(gate, f"{name}/gate")
        x2 = g(x2a) + g(x2b) + g(x2c) + g(x2d)
        x3 = conv(f"{name}/conv3", x2, relu=False)
        if identity.shape[-1] != features:
            identity = conv(f"{name}/downsample", identity, relu=False)
        return jax.nn.relu(x3 + identity)

    c1, c2, c3, c4 = _infer_channels(folded)
    x = conv("conv1", x, strides=(2, 2), padding=((3, 3), (3, 3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x = osblock("conv2_0", x, c2)
    x = osblock("conv2_1", x, c2)
    x = conv("conv2_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = osblock("conv3_0", x, c3)
    x = osblock("conv3_1", x, c3)
    x = conv("conv3_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = osblock("conv4_0", x, c4)
    x = osblock("conv4_1", x, c4)
    x = conv("conv5", x)
    x = jnp.mean(x, axis=(1, 2))
    head = folded["fc_0"]
    if qget is not None:
        x = qget("fc_0", x, None, None, 1)
    else:
        x = x @ head["kernel"] + head["bias"]
    return jax.nn.relu(x)


def forward_folded_f32(folded, x):
    """Float32 reference forward over the folded tree (parity target)."""
    return _forward_folded(folded, x)


def compose_lite_dense(folded) -> dict:
    """Compose every LightConv3x3 (1x1 pointwise -> 3x3 depthwise) into
    ONE dense 3x3 conv with the rank-1-per-channel kernel

        K[t, i, c] = kdw_c[t] * W1[i, c]

    (exact algebra: the depthwise is per-channel, the pointwise mixes
    channels, and no nonlinearity sits between them). Returns
    {"<block>/<lite>": {"kernel" (3,3,Cin,C), "bias"}} for the lite
    pairs plus every other folded entry unchanged.

    Measured outcome on TPU v5e (B=2048 bf16, full model): 143.3 ms vs
    the folded baseline's 129.4 ms — NO win, because XLA already fuses
    each 1x1+depthwise pair into a single pass (pair microbench 3.65 ms
    vs 3.9 ms for either op alone), so the composition saves no HBM
    round trip and pays 9x the MXU FLOPs. Kept as the measured record
    of the experiment and for backends whose grouped-conv lowering is
    worse than their dense one. Numeric parity is exact
    (tests/test_appearance.py).
    """
    out = {}
    lites = set()
    for name in folded:
        if name.endswith("/conv1") and f"{name[:-6]}/conv2" in folded:
            lites.add(name[:-6])
    for name, l in folded.items():
        base = name.rsplit("/", 1)[0]
        if base in lites:
            if name.endswith("/conv2"):
                w1 = folded[f"{base}/conv1"]["kernel"]  # (1,1,Cin,C)
                kdw = l["kernel"]  # (3,3,1,C)
                k = w1[0, 0][None, None, :, :] * kdw[:, :, 0, :][:, :, None, :]
                out[base] = dict(kernel=k.astype(jnp.float32),
                                 bias=l["bias"])
            continue  # conv1 of a lite: folded into the dense kernel
        out[name] = l
    return out


def _forward_folded_dense(composed, x, qget=None):
    """Forward over a compose_lite_dense() tree: same structure as
    _forward_folded but each lite is ONE dense 3x3 conv."""

    def conv(name, x, strides=(1, 1), padding="SAME", groups=1, relu=True):
        l = composed[name]
        if qget is not None:
            y = qget(name, x, strides, padding, groups)
        else:
            y = _conv(x, l["kernel"], l["bias"], strides, padding, groups)
        return jax.nn.relu(y) if relu else y

    def lite(name, x):
        return conv(name, x, padding=((1, 1), (1, 1)))

    def gate(name, x):
        s = jnp.mean(x, axis=(1, 2))
        l1 = composed[f"{name}/fc1"]
        s = jax.nn.relu(s @ l1["kernel"] + l1["bias"])
        l2 = composed[f"{name}/fc2"]
        s = jax.nn.sigmoid(s @ l2["kernel"] + l2["bias"])
        return x * s[:, None, None, :]

    def osblock(name, x, features):
        identity = x
        x1 = conv(f"{name}/conv1", x)
        x2a = lite(f"{name}/conv2a", x1)
        x2b = lite(f"{name}/conv2b_1", lite(f"{name}/conv2b_0", x1))
        x2c = lite(f"{name}/conv2c_2",
                   lite(f"{name}/conv2c_1", lite(f"{name}/conv2c_0", x1)))
        x2d = lite(f"{name}/conv2d_3",
                   lite(f"{name}/conv2d_2",
                        lite(f"{name}/conv2d_1", lite(f"{name}/conv2d_0", x1))))
        g = functools.partial(gate, f"{name}/gate")
        x2 = g(x2a) + g(x2b) + g(x2c) + g(x2d)
        x3 = conv(f"{name}/conv3", x2, relu=False)
        if identity.shape[-1] != features:
            identity = conv(f"{name}/downsample", identity, relu=False)
        return jax.nn.relu(x3 + identity)

    c1, c2, c3, c4 = _infer_channels(composed)
    x = conv("conv1", x, strides=(2, 2), padding=((3, 3), (3, 3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x = osblock("conv2_0", x, c2)
    x = osblock("conv2_1", x, c2)
    x = conv("conv2_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = osblock("conv3_0", x, c3)
    x = osblock("conv3_1", x, c3)
    x = conv("conv3_2_0", x)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
    x = osblock("conv4_0", x, c4)
    x = osblock("conv4_1", x, c4)
    x = conv("conv5", x)
    x = jnp.mean(x, axis=(1, 2))
    head = composed["fc_0"]
    if qget is not None:
        x = qget("fc_0", x, None, None, 1)
    else:
        x = x @ head["kernel"] + head["bias"]
    return jax.nn.relu(x)


# ----------------------------------------------------------- quantization
def _quantize_weight(kernel):
    """Per-output-channel symmetric int8. kernel (..., cout)."""
    amax = jnp.max(jnp.abs(kernel.reshape(-1, kernel.shape[-1])), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)  # (cout,)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def calibrate_osnet(folded, crops_f32, percentile: float = 99.9):
    """One calibration pass: record per-layer input max-abs over a
    representative batch of PREPROCESSED crops (float, normalized as
    make_embed_fn does). Returns {name: act_scale}."""
    amaxes: dict = {}

    def qget(name, x, strides, padding, groups):
        a = jnp.percentile(jnp.abs(x), percentile)
        amaxes[name] = jnp.maximum(amaxes.get(name, 0.0), a)
        l = folded[name]
        if strides is None:  # dense head
            return x @ l["kernel"] + l["bias"]
        return _conv(x, l["kernel"], l["bias"], strides, padding, groups)

    _ = _forward_folded(folded, crops_f32, qget=qget)
    return {k: jnp.maximum(v / 127.0, 1e-8) for k, v in amaxes.items()}


def quantize_osnet(model, variables, calib_crops=None, seed: int = 0):
    """Full quantization pipeline -> qvars dict for make_embed_fn_int8.

    model/variables: as held by ReIDBackend (flax OSNet).
    calib_crops: (B, H, W, 3) float PREPROCESSED crops for activation
        calibration; defaults to a deterministic random batch matching
        ImageNet-normalized statistics (fine for scale estimation —
        document measured cosine in the parity test either way).
    """
    # The whole pipeline is setup-time constant folding: pin it to the
    # host CPU backend and return numpy leaves. Eager per-layer ops
    # through a remote-device tunnel pay one round trip EACH (measured
    # 270 s for x1_0 on the axon tunnel vs ~3 s host-side); the caller
    # closes over the result, so placement happens once at first jit.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    from contextlib import nullcontext

    with jax.default_device(cpu) if cpu is not None else nullcontext():
        folded = fold_osnet(jax.device_get(variables))
        if calib_crops is None:
            rng = np.random.default_rng(seed)
            calib_crops = jnp.asarray(
                rng.normal(0.0, 1.0, (8, 256, 128, 3)), jnp.float32
            )
        act_scales = jax.jit(
            lambda c: calibrate_osnet(folded, c)
        )(jax.device_get(calib_crops))
        qweights = {}
        for name, l in folded.items():
            qk, wscale = _quantize_weight(l["kernel"])
            qweights[name] = dict(kernel=qk, wscale=wscale, bias=l["bias"])
        out = dict(folded=folded, q=qweights,
                   act=jax.tree_util.tree_map(jnp.asarray, act_scales))
    return jax.device_get(out) if cpu is not None else out


def forward_int8(qvars, x, act_dtype=jnp.float32):
    """Quantized forward: int8 convs with int32 accumulation.

    Depthwise convs stay float (grouped int8 convs gain nothing on the
    MXU and the requant round-trip costs accuracy); the 1x1/7x7 convs
    and dense layers run int8. act_dtype: dtype carried between layers.

    MEASURED throughput caveat (TPU v5e via axon, 2026-08-19): int8
    does NOT speed this model up on this stack — the primitive itself
    shows no int8 advantage (1M x 256 x 256 dot_general: 3.44 ms int8
    vs 3.07 ms bf16; dense 3x3 conv: 3.76 vs 3.68 ms), and the full
    model measures 161.6 ms int8 vs 129.4 ms bf16-folded at B=2048
    (quantize/requant passes cost extra). Use for memory footprint
    (weights 4x smaller than f32), not speed; docs/benchmarking.md
    carries the committed A/B.
    """
    folded = qvars["folded"]
    q = qvars["q"]
    act = qvars["act"]

    def qget(name, xf, strides, padding, groups):
        l = q[name]
        if groups is not None and groups > 1:
            # depthwise: float path on folded weights
            f = folded[name]
            return _conv(xf, f["kernel"], f["bias"], strides, padding,
                         groups)
        s_in = act[name]
        xq = jnp.clip(
            jnp.round(xf.astype(jnp.float32) / s_in), -127, 127
        ).astype(jnp.int8)
        if strides is None:  # dense
            acc = jax.lax.dot_general(
                xq, l["kernel"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = jax.lax.conv_general_dilated(
                xq, l["kernel"],
                window_strides=strides,
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=1,
                preferred_element_type=jnp.int32,
            )
        y = acc.astype(jnp.float32) * (s_in * l["wscale"]) + l["bias"]
        return y.astype(xf.dtype)

    return _forward_folded(folded, x.astype(act_dtype), qget=qget)


def make_embed_fn_int8(model, variables, norm=None, calib_crops=None,
                       act_dtype=None):
    """Int8 drop-in for appearance.reid.make_embed_fn: uint8 BGR crops
    -> (B, D) L2-normalized float32 embeddings, quantized CNN inside.

    act_dtype: inter-layer activation dtype; defaults to bfloat16 on
    TPU (halves activation HBM traffic) and float32 on CPU (bf16 is
    software-emulated there). Cosine agreement vs the f32 path is
    pinned in tests/test_appearance.py. NOTE: measured on TPU v5e this
    path is SLOWER than bf16 (see forward_int8) — prefer
    make_embed_fn(compute_dtype="bfloat16") for throughput; int8 is a
    footprint option."""
    from motcpp_tpu.appearance.reid import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        normalize_features,
    )

    if norm is None:
        norm = (IMAGENET_MEAN, IMAGENET_STD)
    if act_dtype is None:
        act_dtype = (
            jnp.float32 if jax.devices()[0].platform == "cpu"
            else jnp.bfloat16
        )
    mean = jnp.asarray(norm[0], jnp.float32)
    std = jnp.asarray(norm[1], jnp.float32)
    qvars = quantize_osnet(model, variables, calib_crops=calib_crops)

    def embed(crops):
        x = crops.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB
        x = (x - mean) / std
        feats = forward_int8(qvars, x, act_dtype=act_dtype)
        return normalize_features(feats.astype(jnp.float32))

    return embed
