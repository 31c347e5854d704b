"""ReID backend: on-device crop extraction + Flax CNN embeddings.

TPU-native equivalent of the reference's backend contract (reference:
src/appearance/reid_backend.cpp:10-123, onnx_backend.cpp:110-240):

    get_features(xyxys (N, 4), img) -> (N, D) L2-normalized embeddings

The crop pipeline mirrors the reference exactly — round + clamp the box,
bilinear-resize to the model's H x W, BGR->RGB, /255, (x - mean)/std —
but runs as ONE batched jnp gather over all N boxes (no per-crop loop),
with model-name heuristics for input shape (256x128 default, 256x256
vehicle, 384x128 lmbn, 160x64 hacnn) and ImageNet-vs-CLIP normalization
(reid_backend.cpp:88-123). Inference replaces the ONNX-Runtime session
with a jitted Flax OSNet forward; max-batch chunking is unnecessary
because N is already fixed-capacity padded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.5, 0.5, 0.5)
CLIP_STD = (0.5, 0.5, 0.5)


def determine_input_shape(model_name: str):
    """reference: reid_backend.cpp:88-105."""
    name = model_name or ""
    if "vehicleid" in name or "veri" in name:
        return (256, 256)
    if "lmbn" in name:
        return (384, 128)
    if "hacnn" in name:
        return (160, 64)
    return (256, 128)


def determine_normalization(model_name: str):
    """reference: reid_backend.cpp:109-123."""
    if "clip" in (model_name or ""):
        return CLIP_MEAN, CLIP_STD
    return IMAGENET_MEAN, IMAGENET_STD


@functools.partial(jax.jit, static_argnums=(2, 3))
def extract_crops(img_bgr, xyxys, crop_hw, norm):
    """Batched crop + resize + normalize (reference:
    reid_backend.cpp:10-68).

    img_bgr: (H, W, 3) uint8/float BGR image
    xyxys: (N, 4) float boxes
    crop_hw: static (crop_h, crop_w)
    norm: static ((mean3), (std3)) applied per RGB channel
    Returns (N, crop_h, crop_w, 3) float32 RGB crops, normalized.
    """
    crop_h, crop_w = crop_hw
    mean, std = norm
    H, W = img_bgr.shape[0], img_bgr.shape[1]
    img = img_bgr.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB, [0,1]

    x1 = jnp.clip(jnp.round(xyxys[:, 0]), 0, W)
    y1 = jnp.clip(jnp.round(xyxys[:, 1]), 0, H)
    x2 = jnp.clip(jnp.round(xyxys[:, 2]), 0, W)
    y2 = jnp.clip(jnp.round(xyxys[:, 3]), 0, H)
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    # cv2.resize INTER_LINEAR sampling: src = (dst + 0.5) * scale - 0.5
    dy = (jnp.arange(crop_h) + 0.5) * (bh[:, None] / crop_h) - 0.5 + y1[:, None]
    dx = (jnp.arange(crop_w) + 0.5) * (bw[:, None] / crop_w) - 0.5 + x1[:, None]

    y0 = jnp.floor(dy)
    x0 = jnp.floor(dx)
    wy = dy - y0
    wx = dx - x0

    def sample(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        # (N, crop_h, crop_w, 3) gather
        return img[yi[:, :, None], xi[:, None, :]]

    tl = sample(y0, x0)
    tr = sample(y0, x0 + 1)
    bl = sample(y0 + 1, x0)
    br = sample(y0 + 1, x0 + 1)
    wyc = wy[:, :, None, None]
    wxc = wx[:, None, :, None]
    crops = (
        tl * (1 - wyc) * (1 - wxc)
        + tr * (1 - wyc) * wxc
        + bl * wyc * (1 - wxc)
        + br * wyc * wxc
    )
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (crops - mean_a) / std_a


def normalize_features(feats):
    """Row-wise L2 with the reference's zero guard
    (reid_backend.cpp:70-86)."""
    n = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return jnp.where(n > 1e-6, feats / jnp.where(n > 1e-6, n, 1.0), feats)


def _check_compute_dtype(compute_dtype: str):
    if compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"compute_dtype must be float32 or bfloat16, "
            f"got {compute_dtype!r}"
        )
    return jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32


def _cast_variables(variables, compute_dtype: str):
    """Cast float leaves (params AND batch_stats) to the compute dtype.

    One cast rule shared by the host backend and the in-graph
    make_embed_fn so the precomputed-embs and crops-in paths can never
    diverge numerically."""
    if compute_dtype != "bfloat16":
        return variables
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables,
    )


class ReIDBackend:
    """Host-facing backend mirroring the reference contract.

    Args:
        weights: optional path to a torchreid checkpoint (.pt/.pth) —
            name-mapped to full Flax variables (params + BatchNorm
            batch_stats) — or a .npz of pre-converted variables
            (scripts/convert_reid_weights.py). Unknown suffixes raise.
            Without weights the CNN runs randomly initialized
            (embeddings are still deterministic and L2-normalized; only
            useful for shape/throughput work).
        model_name: drives input-shape and normalization heuristics; when
            empty, inferred from the weights filename.
        compute_dtype: "float32" (default, torch-parity ≤1e-4) or
            "bfloat16" — casts weights and activations so the conv/
            matmul path rides the MXU at its native 16-bit rate.
            Embeddings return as L2-normalized float32 either way;
            bf16-vs-f32 cosine agreement is pinned ≥0.995 in
            tests/test_appearance.py. Use bf16 for throughput-bound
            serving, f32 when reproducing reference numbers.
        dw_impl: depthwise-conv schedule, "conv" (XLA grouped conv) or
            "shift" (unrolled shift-FMA stencil, same param tree —
            checkpoints load unchanged; numeric parity pinned in
            tests/test_appearance.py). Pick whichever profiles faster
            on the target backend (scripts/profile_osnet.py --dw-impl).
    """

    def __init__(self, weights: str = "", model_name: str = "", seed: int = 0,
                 compute_dtype: str = "float32", dw_impl: str = "conv"):
        from motcpp_tpu.appearance.osnet import (
            init_params,
            load_weights_auto,
            osnet_x1_0,
        )

        if dw_impl not in ("conv", "shift"):
            raise ValueError(
                f"dw_impl must be 'conv' or 'shift', got {dw_impl!r}"
            )

        if not model_name and weights:
            model_name = str(weights).rsplit("/", 1)[-1]
        self.model_name = model_name
        self.input_shape = determine_input_shape(model_name)
        self.norm = determine_normalization(model_name)
        if weights:
            # full variables (params + batch_stats), name-mapped; the
            # architecture variant (x1_0/x0_25/...) is inferred from the
            # tensors and shape-verified (raises listing any mismatch;
            # unknown file suffixes also raise)
            self.model, self.variables = load_weights_auto(weights)
            if dw_impl != "conv":
                # same param tree — only the compute schedule changes
                self.model = self.model.clone(dw_impl=dw_impl)
        else:
            self.model = osnet_x1_0(dw_impl=dw_impl)
            self.variables = init_params(self.model, self.input_shape, seed)

        cdt = _check_compute_dtype(compute_dtype)
        self.compute_dtype = compute_dtype
        self.variables = _cast_variables(self.variables, compute_dtype)

        @jax.jit
        def _forward(variables, crops):
            feats = self.model.apply(variables, crops.astype(cdt), train=False)
            return normalize_features(feats.astype(jnp.float32))

        self._forward = _forward

    def get_crops(self, xyxys, img):
        """(N, 3*H*W) CHW-flattened crops — reference output contract
        (reid_backend.cpp:10-68). Internally NHWC."""
        crops = extract_crops(
            jnp.asarray(img), jnp.asarray(xyxys, jnp.float32),
            self.input_shape, self.norm,
        )
        n = crops.shape[0]
        return np.asarray(
            jnp.transpose(crops, (0, 3, 1, 2)).reshape(n, -1)
        )

    def get_features(self, xyxys, img):
        """(N, D) L2-normalized embeddings (onnx_backend.cpp:110-158)."""
        xyxys = np.asarray(xyxys, np.float32)
        if xyxys.shape[0] == 0:
            return np.zeros((0, self.model.feature_dim), np.float32)
        crops = extract_crops(
            jnp.asarray(img), jnp.asarray(xyxys), self.input_shape, self.norm
        )
        return np.asarray(self._forward(self.variables, crops))

    def warmup(self):
        """Compile the forward with a random batch-2 input
        (onnx_backend.cpp:225-240)."""
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (256, 256, 3), np.uint8)
        self.get_features(
            np.asarray([[0, 0, 128, 256], [64, 0, 192, 256]], np.float32), img
        )


def make_embed_fn(model, variables, norm=(IMAGENET_MEAN, IMAGENET_STD),
                 compute_dtype: str = "float32", folded: bool = False,
                 fused: bool = False):
    """Build a PURE jit/vmap/scan-composable crop->embedding function.

    This is the in-graph half of the live-ReID serving path (the
    reference computes features inside update() on the host via ORT,
    onnx_backend.cpp:110-223; here the CNN runs inside the same XLA
    program as the tracker step):

        embed(crops (B, H, W, 3) uint8 BGR) -> (B, D) float32, L2-norm

    The preprocessing matches get_crops exactly (BGR->RGB, /255,
    (x-mean)/std, reference reid_backend.cpp:10-68) so precomputed-embs
    and crops-in paths produce identical features for identical crops.
    ``variables`` are closed over (replicated per device under
    shard_map). compute_dtype="bfloat16" casts weights + activations so
    the convs ride the MXU at 16-bit rate (cosine parity >=0.995 pinned
    in tests/test_appearance.py).
    """
    cdt = _check_compute_dtype(compute_dtype)
    mean = jnp.asarray(norm[0], jnp.float32)
    std = jnp.asarray(norm[1], jnp.float32)
    if fused:
        # every OSBlock as ONE fused Pallas kernel over the folded tree
        # (appearance/osblock_pallas.py): the block's ~15 intermediate
        # activations stay in VMEM instead of round-tripping HBM.
        # TPU-only (Mosaic); tests drive it through interpret=True.
        import math

        from motcpp_tpu.appearance.osblock_pallas import (
            DEFAULT_TILES,
            forward_fused,
        )
        from motcpp_tpu.appearance.quant import fold_osnet

        folded_tree = fold_osnet(jax.device_get(variables))
        folded_tree = _cast_variables({"params": folded_tree},
                                      compute_dtype)["params"]
        mult = math.lcm(*DEFAULT_TILES.values())
        interp = jax.devices()[0].platform != "tpu"

        def embed(crops):
            x = crops.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB
            x = (x - mean) / std
            b = x.shape[0]
            bp = -(-b // mult) * mult
            if bp != b:  # pad to the stage-tile lcm, slice after
                x = jnp.concatenate(
                    [x, jnp.zeros((bp - b,) + x.shape[1:], x.dtype)], 0
                )
            feats = forward_fused(folded_tree, x.astype(cdt),
                                  interpret=interp)
            return normalize_features(feats[:b].astype(jnp.float32))

        return embed
    if folded:
        # BN folded into conv kernel+bias (inference-only algebra,
        # appearance/quant.py): one elementwise pass fewer per conv —
        # measured +8% on TPU v5e (129.4 vs 139.6 ms at B=2048 bf16).
        # f32-exact vs model.apply (pinned in tests/test_appearance.py)
        from motcpp_tpu.appearance.quant import _forward_folded, fold_osnet

        folded_tree = fold_osnet(jax.device_get(variables))
        folded_tree = _cast_variables({"params": folded_tree},
                                      compute_dtype)["params"]

        def embed(crops):
            x = crops.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB
            x = (x - mean) / std
            feats = _forward_folded(folded_tree, x.astype(cdt))
            return normalize_features(feats.astype(jnp.float32))

        return embed

    variables = _cast_variables(variables, compute_dtype)

    def embed(crops):
        x = crops.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB
        x = (x - mean) / std
        feats = model.apply(variables, x.astype(cdt), train=False)
        return normalize_features(feats.astype(jnp.float32))

    return embed


def embed_valid_crops(embed_fn, crops, dets, masks, budget=None,
                      priority=None):
    """Run the ReID CNN over at most ``budget`` VALID crops per call.

    crops (S, N, Hc, Wc, 3) uint8, dets (S, N, >=5), masks (S, N) bool
    -> embeddings (S, N, D) float32.

    The padded live-ReID leg embeds every det *slot*, valid or not; the
    reference embeds only the actual detections of the frame
    (onnx_backend.cpp:110-133 loops the real crop list). This is the
    static-shape TPU equivalent: a compaction gather pulls the valid
    crops to the front (highest detection confidence first), the CNN
    runs on a fixed (budget, Hc, Wc, 3) batch, and a scatter places the
    features back into the (S, N, D) slot layout. Invalid slots get
    zero embeddings (they are masked out of every cost matrix anyway).

    Overflow semantics: if a frame-batch carries more valid crops than
    ``budget``, the LOWEST-confidence overflow detections get a zero
    embedding — they still associate by motion/IoU, only the appearance
    term degrades to "no feature" for that frame. Deterministic: the
    compaction order is argsort over (validity, -confidence).

    priority (S, N) float, optional: overrides the default
    confidence-descending selection order — higher priority embeds
    first. The serving priority-budget policy (parallel.streams
    emb_priority) passes novelty/crowding/rotation scores here so the
    budget goes to the detections whose appearance actually matters
    (measured: StrongSORT at a 60% budget costs 0.6 HOTA with priority
    vs 12.3 at 50% with plain confidence order — docs/benchmarking.md,
    tests/accuracy_budget.json).

    budget=None or budget >= S*N is the plain full-batch path,
    bit-identical to historical behavior.
    """
    S, N = crops.shape[:2]
    flat = crops.reshape((S * N,) + crops.shape[2:])
    if budget is None or int(budget) >= S * N:
        return embed_fn(flat).reshape(S, N, -1)
    C = int(budget)
    if C < 1:
        raise ValueError(f"crop budget must be >= 1, got {budget}")
    mflat = masks.reshape(S * N)
    if priority is None:
        pri = dets[..., 4].reshape(S * N).astype(jnp.float32)
    else:
        pri = jnp.asarray(priority, jnp.float32).reshape(S * N)
    # valid first, then by priority descending; invalid sort to +inf
    key = jnp.where(mflat, -pri, jnp.inf)
    idx = jnp.argsort(key)[:C]
    feats = embed_fn(jnp.take(flat, idx, axis=0))  # (C, D)
    keep = mflat[idx].astype(feats.dtype)[:, None]
    out = jnp.zeros((S * N, feats.shape[-1]), feats.dtype)
    out = out.at[idx].set(feats * keep)
    return out.reshape(S, N, -1)
