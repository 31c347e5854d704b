"""OSNet (Omni-Scale Network) for person re-identification, in Flax.

TPU-native replacement for the reference's ONNX-Runtime OSNet inference
(reference: src/appearance/onnx_backend.cpp:13-240 runs an exported
osnet_x1_0 graph; scripts/export_reid_onnx.py:15-50 exports it from
torchreid). Here the architecture itself is implemented as a Flax module
(public architecture: Zhou et al., "Omni-Scale Feature Learning for
Person Re-Identification", ICCV 2019):

  conv1 7x7/2 + maxpool -> 3 stages of omni-scale residual blocks whose
  parallel depthwise-separable streams (receptive fields 3..9) are fused
  by a shared channel-attention Aggregation Gate -> 1x1 conv -> global
  average pool -> fc -> 512-d embedding.

Weights: load a converted torchreid checkpoint via
:func:`load_torch_weights` (torch CPU is available in this image; the
osnet state_dict layout is mapped onto the Flax param tree), or run with
random initialization for architecture/throughput testing.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBNReLU(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    groups: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class LiteConv3x3(nn.Module):
    """1x1 pointwise + 3x3 depthwise (the OSNet Lite convolution)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            feature_group_count=self.features,
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class AggregationGate(nn.Module):
    """Channel attention shared across streams (OSNet unified AG)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # global average pool (N, C)
        s = nn.Dense(self.features // self.reduction)(s)
        s = nn.relu(s)
        s = nn.Dense(self.features)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class OSBlock(nn.Module):
    """Omni-scale residual block with T parallel Lite-conv streams."""

    features: int
    streams: int = 4
    bottleneck_reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // self.bottleneck_reduction
        identity = x
        y = ConvBNReLU(mid, (1, 1))(x, train)

        gate = AggregationGate(mid)
        agg = None
        for t in range(1, self.streams + 1):
            s = y
            for _ in range(t):
                s = LiteConv3x3(mid)(s, train)
            s = gate(s)
            agg = s if agg is None else agg + s

        y = nn.Conv(self.features, (1, 1), use_bias=False)(agg)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), use_bias=False)(identity)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9)(
                identity
            )
        return nn.relu(y + identity)


class OSNet(nn.Module):
    """OSNet backbone + embedding head.

    channels: per-stage widths; osnet_x1_0 uses (64, 256, 384, 512).
    feature_dim: output embedding size (512 like the exported models the
    reference consumes).
    """

    channels: Sequence[int] = (64, 256, 384, 512)
    blocks_per_stage: int = 2
    feature_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4 = self.channels
        # conv1 + maxpool
        x = ConvBNReLU(c1, (7, 7), strides=(2, 2))(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        # stage 2
        for _ in range(self.blocks_per_stage):
            x = OSBlock(c2)(x, train)
        x = ConvBNReLU(c2, (1, 1))(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # stage 3
        for _ in range(self.blocks_per_stage):
            x = OSBlock(c3)(x, train)
        x = ConvBNReLU(c3, (1, 1))(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # stage 4
        for _ in range(self.blocks_per_stage):
            x = OSBlock(c4)(x, train)
        x = ConvBNReLU(c4, (1, 1))(x, train)
        # head
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.feature_dim)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return x


def osnet_x1_0(feature_dim: int = 512) -> OSNet:
    return OSNet(channels=(64, 256, 384, 512), feature_dim=feature_dim)


def osnet_x0_25(feature_dim: int = 512) -> OSNet:
    return OSNet(channels=(16, 64, 96, 128), feature_dim=feature_dim)


def init_params(model: OSNet, input_hw=(256, 128), seed: int = 0):
    """Initialize parameters for a given crop size (NHWC)."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    return model.init(rng, dummy, train=False)


def load_torch_weights(model: OSNet, params, path: str):
    """Map a torchreid OSNet state_dict (.pt/.pth) onto the Flax tree.

    Equivalent role to the reference's ONNX export + ORT session load
    (reference: scripts/export_reid_onnx.py); torch (CPU) ships in this
    image so checkpoints convert directly. Tensors are matched by
    traversal order within compatible shapes; conv kernels transpose
    OIHW -> HWIO (depthwise -> HWOI-style Flax layout).
    """
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    tensors = [
        (k, v.numpy()) for k, v in sd.items() if hasattr(v, "numpy")
    ]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def torch_to_flax(arr, target_shape):
        if arr.ndim == 4:
            # OIHW -> HWIO
            cand = np.transpose(arr, (2, 3, 1, 0))
            if cand.shape == tuple(target_shape):
                return cand
            # depthwise: O1HW -> HWIO with I=1
            cand = np.transpose(arr, (2, 3, 1, 0))
            if cand.shape == tuple(target_shape):
                return cand
        elif arr.ndim == 2:
            cand = arr.T
            if cand.shape == tuple(target_shape):
                return cand
        if arr.shape == tuple(target_shape):
            return arr
        return None

    used = [False] * len(tensors)
    new_leaves = []
    for path_, leaf in flat:
        matched = None
        for idx, (name, arr) in enumerate(tensors):
            if used[idx]:
                continue
            cand = torch_to_flax(arr, leaf.shape)
            if cand is not None:
                matched = cand
                used[idx] = True
                break
        new_leaves.append(
            jnp.asarray(matched) if matched is not None else leaf
        )
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
