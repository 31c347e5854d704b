"""OSNet (Omni-Scale Network) for person re-identification, in Flax.

TPU-native replacement for the reference's ONNX-Runtime OSNet inference
(reference: src/appearance/onnx_backend.cpp:13-240 runs an exported
osnet_x1_0 graph; scripts/export_reid_onnx.py:15-50 exports it from
torchreid). Here the architecture itself is implemented as a Flax module
(public architecture: Zhou et al., "Omni-Scale Feature Learning for
Person Re-Identification", ICCV 2019):

  conv1 7x7/2 + maxpool -> 3 stages of omni-scale residual blocks whose
  parallel depthwise-separable streams (receptive fields 3..9) are fused
  by a shared channel-attention gate -> 1x1 conv -> global average pool
  -> fc (Linear+BN+ReLU) -> 512-d embedding.

Module names and padding mirror the torchreid layout exactly so that a
real torchreid ``state_dict`` maps DETERMINISTICALLY (by name, not by
shape) onto the Flax tree — including BatchNorm running statistics into
the ``batch_stats`` collection. :func:`load_torch_weights` performs the
conversion and raises on any unmapped or shape-mismatched tensor, and a
torch-vs-Flax forward parity test (tests/test_appearance.py) pins the
numerics to <=1e-4.
"""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBNReLU(nn.Module):
    """torchreid ConvLayer / Conv1x1 (``conv`` + ``bn`` [+ ReLU])."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = "VALID"
    groups: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn"
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DepthwiseShift3x3(nn.Module):
    """3x3 stride-1 SAME depthwise conv as 9 shifted multiply-adds.

    Mathematically identical to ``nn.Conv(feature_group_count=C)`` and
    declares the SAME parameter (``kernel`` of shape (3, 3, 1, C), HWIO
    depthwise layout) so converted torchreid checkpoints map unchanged.
    The schedule differs: instead of XLA's grouped-convolution lowering,
    the 9 taps are unrolled into an elementwise FMA stencil over shifted
    views of the padded input — pure VPU work that XLA fuses into one
    bandwidth-bound loop. Exists because grouped convs are the profiled
    hot spot of OSNet on TPU; parity is pinned in tests/test_appearance.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, self.features),
            jnp.float32,
        ).astype(x.dtype)
        H, W = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for i in range(3):
            for j in range(3):
                term = xp[:, i : i + H, j : j + W, :] * k[i, j, 0, :]
                out = term if out is None else out + term
        return out


class LiteConv3x3(nn.Module):
    """torchreid LightConv3x3: 1x1 pointwise + 3x3 depthwise + BN + ReLU.

    dw_impl selects the depthwise schedule: "conv" (XLA grouped conv)
    or "shift" (:class:`DepthwiseShift3x3`); both share one param layout.
    """

    features: int
    dw_impl: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        if self.dw_impl == "shift":
            x = DepthwiseShift3x3(self.features, name="conv2")(x)
        else:
            x = nn.Conv(
                self.features,
                (3, 3),
                padding=((1, 1), (1, 1)),
                feature_group_count=self.features,
                use_bias=False,
                name="conv2",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class ChannelGate(nn.Module):
    """torchreid ChannelGate: channel attention shared across streams.

    torchreid implements fc1/fc2 as 1x1 Conv2d over the pooled (N,C,1,1)
    map; on a pooled vector that is exactly a Dense layer, so the Flax
    side uses Dense and the converter squeezes the (out,in,1,1) kernels.
    """

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # global average pool (N, C)
        s = nn.Dense(self.features // self.reduction, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class OSBlock(nn.Module):
    """Omni-scale residual block: 4 parallel Lite-conv streams of depth
    1..4 from a shared 1x1 bottleneck, fused by a SHARED channel gate."""

    features: int
    bottleneck_reduction: int = 4
    dw_impl: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // self.bottleneck_reduction
        identity = x
        x1 = ConvBNReLU(mid, (1, 1), name="conv1")(x, train)

        def lite(name):
            return LiteConv3x3(mid, dw_impl=self.dw_impl, name=name)

        # streams: conv2a (1 lite conv), conv2b (2), conv2c (3), conv2d (4)
        x2a = lite("conv2a")(x1, train)
        x2b = lite("conv2b_0")(x1, train)
        x2b = lite("conv2b_1")(x2b, train)
        x2c = lite("conv2c_0")(x1, train)
        x2c = lite("conv2c_1")(x2c, train)
        x2c = lite("conv2c_2")(x2c, train)
        x2d = lite("conv2d_0")(x1, train)
        x2d = lite("conv2d_1")(x2d, train)
        x2d = lite("conv2d_2")(x2d, train)
        x2d = lite("conv2d_3")(x2d, train)

        gate = ChannelGate(mid, name="gate")
        x2 = gate(x2a) + gate(x2b) + gate(x2c) + gate(x2d)

        x3 = ConvBNReLU(
            self.features, (1, 1), use_relu=False, name="conv3"
        )(x2, train)
        if identity.shape[-1] != self.features:
            identity = ConvBNReLU(
                self.features, (1, 1), use_relu=False, name="downsample"
            )(identity, train)
        return nn.relu(x3 + identity)


class OSNet(nn.Module):
    """OSNet backbone + embedding head.

    channels: per-stage widths; osnet_x1_0 uses (64, 256, 384, 512).
    feature_dim: output embedding size (512 like the exported models the
    reference consumes). Padding matches torch exactly (conv1 pad 3,
    maxpool pad 1) so converted checkpoints are numerically faithful.
    """

    channels: Sequence[int] = (64, 256, 384, 512)
    feature_dim: int = 512
    dw_impl: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2, c3, c4 = self.channels

        def block(feats, name):
            return OSBlock(feats, dw_impl=self.dw_impl, name=name)

        x = ConvBNReLU(
            c1, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            name="conv1",
        )(x, train)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        # stage 2 (torchreid conv2: 2 blocks + Conv1x1 transition + avgpool)
        x = block(c2, "conv2_0")(x, train)
        x = block(c2, "conv2_1")(x, train)
        x = ConvBNReLU(c2, (1, 1), name="conv2_2_0")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # stage 3
        x = block(c3, "conv3_0")(x, train)
        x = block(c3, "conv3_1")(x, train)
        x = ConvBNReLU(c3, (1, 1), name="conv3_2_0")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # stage 4 (no spatial reduction) + conv5
        x = block(c4, "conv4_0")(x, train)
        x = block(c4, "conv4_1")(x, train)
        x = ConvBNReLU(c4, (1, 1), name="conv5")(x, train)
        # head: gap -> Linear -> BN1d -> ReLU (torchreid _construct_fc_layer)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.feature_dim, name="fc_0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="fc_1"
        )(x)
        return nn.relu(x)


def osnet_x1_0(feature_dim: int = 512, dw_impl: str = "conv") -> OSNet:
    return OSNet(channels=(64, 256, 384, 512), feature_dim=feature_dim,
                 dw_impl=dw_impl)


def osnet_x0_75(feature_dim: int = 512, dw_impl: str = "conv") -> OSNet:
    return OSNet(channels=(48, 192, 288, 384), feature_dim=feature_dim,
                 dw_impl=dw_impl)


def osnet_x0_5(feature_dim: int = 512, dw_impl: str = "conv") -> OSNet:
    return OSNet(channels=(32, 128, 192, 256), feature_dim=feature_dim,
                 dw_impl=dw_impl)


def osnet_x0_25(feature_dim: int = 512, dw_impl: str = "conv") -> OSNet:
    return OSNet(channels=(16, 64, 96, 128), feature_dim=feature_dim,
                 dw_impl=dw_impl)


def init_params(model: OSNet, input_hw=(256, 128), seed: int = 0):
    """Initialize parameters for a given crop size (NHWC).

    Runs on the host CPU backend and returns NUMPY leaves: params are
    setup-time constants that get closed over / device_put once by the
    caller, and initializing them through a remote-device tunnel pays
    per-op round trips (measured 130 s for x1_0 on the axon tunnel vs
    ~2 s host-side).
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else _nullcontext():
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        variables = model.init(rng, dummy, train=False)
    return jax.device_get(variables) if cpu is not None else variables


# --------------------------------------------------------------- convert
def _flax_path_for(torch_key: str):
    """torch module path -> Flax module path: numeric components merge
    into the previous name (``conv2.0.conv2b.1`` -> ``conv2_0/conv2b_1``)."""
    parts = torch_key.split(".")
    mods: list[str] = []
    for c in parts[:-1]:
        if c.isdigit() and mods:
            mods[-1] = f"{mods[-1]}_{c}"
        else:
            mods.append(c)
    return mods, parts[-1]


def convert_torch_state_dict(state_dict) -> dict:
    """torchreid OSNet state_dict -> ``{"params": ..., "batch_stats": ...}``.

    Deterministic name-based mapping (never by shape):

      * conv ``weight`` (4-D) -> ``kernel`` OIHW->HWIO (depthwise O1HW
        lands in Flax's (H, W, 1, C) layout via the same transpose)
      * gate fc1/fc2 Conv2d ``weight`` (out,in,1,1) -> Dense ``kernel``
      * Linear ``weight`` (2-D) -> ``kernel`` transposed
      * BN ``weight``/``bias`` -> params ``scale``/``bias``;
        ``running_mean``/``running_var`` -> batch_stats ``mean``/``var``
      * ``classifier.*`` (training head) and ``num_batches_tracked`` skipped
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, mods, leaf_name, value):
        node = tree
        for m in mods:
            node = node.setdefault(m, {})
        node[leaf_name] = jnp.asarray(value)

    keys = set(state_dict.keys())
    for key, tensor in state_dict.items():
        if key.startswith("classifier.") or key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        mods, leaf = _flax_path_for(key)
        module = key.rsplit(".", 1)[0]
        is_bn = f"{module}.running_mean" in keys

        if leaf == "running_mean":
            put(batch_stats, mods, "mean", arr)
        elif leaf == "running_var":
            put(batch_stats, mods, "var", arr)
        elif leaf == "weight":
            if is_bn:
                put(params, mods, "scale", arr)
            elif arr.ndim == 4:
                if mods and mods[-1] in ("fc1", "fc2"):
                    # ChannelGate 1x1 Conv2d -> Dense
                    put(params, mods, "kernel", arr[:, :, 0, 0].T)
                else:
                    put(params, mods, "kernel", np.transpose(arr, (2, 3, 1, 0)))
            elif arr.ndim == 2:
                put(params, mods, "kernel", arr.T)
            else:
                raise ValueError(f"unhandled weight shape {arr.shape} at {key}")
        elif leaf == "bias":
            put(params, mods, "bias", arr)
        else:
            raise ValueError(f"unhandled state_dict entry: {key}")

    return {"params": params, "batch_stats": batch_stats}


def _flat_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _verify_congruent(variables, converted) -> None:
    """Raise ValueError listing every leaf the converted tree is
    missing, has extra, or mismatches in shape vs ``variables``."""
    import flax

    ref = flax.core.unfreeze(variables)
    errors = []
    for coll in ("params", "batch_stats"):
        want = _flat_paths(ref.get(coll, {}))
        got = _flat_paths(converted.get(coll, {}))
        for p in sorted(set(want) | set(got)):
            name = f"{coll}/" + "/".join(p)
            if p not in got:
                errors.append(f"missing in checkpoint: {name}")
            elif p not in want:
                errors.append(f"unexpected in checkpoint: {name}")
            elif tuple(got[p].shape) != tuple(want[p].shape):
                errors.append(
                    f"shape mismatch at {name}: checkpoint "
                    f"{tuple(got[p].shape)} vs model {tuple(want[p].shape)}"
                )
    if errors:
        raise ValueError(
            "torch checkpoint does not map onto this OSNet:\n  "
            + "\n  ".join(errors[:20])
            + (f"\n  ... and {len(errors) - 20} more" if len(errors) > 20 else "")
        )


def infer_osnet(variables) -> OSNet:
    """Reconstruct the OSNet variant (channel widths, feature dim) from
    a converted variables tree — so ReIDBackend can load any
    osnet_x* checkpoint without being told which one it is."""
    try:
        p = variables["params"]
        channels = (
            p["conv1"]["conv"]["kernel"].shape[-1],
            p["conv2_2_0"]["conv"]["kernel"].shape[-1],
            p["conv3_2_0"]["conv"]["kernel"].shape[-1],
            p["conv5"]["conv"]["kernel"].shape[-1],
        )
        feature_dim = p["fc_0"]["kernel"].shape[-1]
    except KeyError as e:
        raise ValueError(
            f"variables tree is not an OSNet layout (missing {e})"
        ) from e
    return OSNet(channels=channels, feature_dim=feature_dim)


def load_torch_weights(model: OSNet, variables, path: str) -> dict:
    """Load a torchreid OSNet checkpoint (.pt/.pth) into full Flax
    variables (params + batch_stats), verifying the converted tree is
    exactly congruent with ``variables`` (every leaf present, every
    shape equal) — raises ValueError otherwise.

    Equivalent role to the reference's ONNX export + ORT session load
    (reference: scripts/export_reid_onnx.py, onnx_backend.cpp:13-108).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # torchreid checkpoints sometimes carry a DataParallel "module." prefix
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    converted = convert_torch_state_dict(sd)
    _verify_congruent(variables, converted)
    return converted


def load_weights_auto(path: str):
    """Load .pt/.pth/.npz OSNet weights, inferring the architecture
    variant from the tensors; returns (model, variables), shape-verified
    against a fresh init of the inferred model."""
    p = str(path)
    if p.endswith((".pt", ".pth")):
        import torch

        sd = torch.load(p, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        converted = convert_torch_state_dict(sd)
    elif p.endswith(".npz"):
        converted = load_npz_variables(p)
    else:
        raise ValueError(
            f"unrecognized ReID weights format: {path!r} (expected "
            ".pt/.pth torchreid checkpoint or .npz from "
            "scripts/convert_reid_weights.py)"
        )
    model = infer_osnet(converted)
    _verify_congruent(init_params(model), converted)
    return model, converted


# ------------------------------------------------------------- npz io
def save_npz_variables(path, variables) -> None:
    """Save full Flax variables as a flat .npz ('params/conv1/conv/kernel'
    style keys) — the output format of scripts/convert_reid_weights.py."""
    flat = {}
    for coll, tree in variables.items():
        for p, v in _flat_paths(dict(tree)).items():
            flat["/".join((coll,) + p)] = np.asarray(v)
    np.savez(path, **flat)


def load_npz_variables(path) -> dict:
    """Inverse of :func:`save_npz_variables`."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            parts = key.split("/")
            node = out
            for m in parts[:-1]:
                node = node.setdefault(m, {})
            node[parts[-1]] = jnp.asarray(data[key])
    return out
