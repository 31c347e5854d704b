"""Deterministic synthetic scenes for CMC / embedding end-to-end tests.

The reference only ever exercises its CMC estimators on real video and
its ReID fusion on pre-generated embeddings; neither path has golden
regression there. Here a fully deterministic moving-camera scene (pan
over a fixed texture, objects static in world coordinates, per-identity
embedding vectors) drives the live ECC / SOF / SOFJax estimators and the
gallery/EMA embedding paths of the five CMC+ReID trackers, so their
warp-application logic (reference: botsort.cpp:60-91 multi_gmc,
strongsort.cpp:111-132 camera_update, deepocsort.cpp:636-648) is pinned
end to end by tests/golden_cmc.
"""

from __future__ import annotations

import numpy as np


def camera_pan_scene(
    n_frames: int = 30,
    img_hw: tuple = (240, 320),
    pan_per_frame: tuple = (3, 1),
    n_objects: int = 5,
    emb_dim: int = 32,
    dropout_frames: dict | None = None,
    seed: int = 0,
):
    """Build a deterministic pan sequence.

    The camera slides over a fixed smooth texture by ``pan_per_frame``
    (dx, dy) pixels per frame; objects are STATIC in world coordinates,
    so their image-space boxes translate opposite to the pan — exactly
    the motion a CMC warp must compensate before association.

    Returns (frames, dets_per_frame, embs_per_frame):
      frames: list of (H, W, 3) uint8 BGR images
      dets_per_frame: list of (n, 6) float32 [x1,y1,x2,y2,conf,cls]
      embs_per_frame: list of (n, emb_dim) float32 unit vectors —
        one fixed vector per object identity (plus tiny deterministic
        per-frame noise), so embedding-driven association is exercised.

    dropout_frames: {object_index: set(frame_ids)} detections to drop
    (forces re-matching through the lost/OCR/gallery paths).
    """
    H, W = img_hw
    dx, dy = pan_per_frame
    rng = np.random.default_rng(seed)
    dropout_frames = dropout_frames or {}

    # world texture big enough for the full pan, smooth enough for LK/ECC
    world_h = H + abs(dy) * n_frames + 64
    world_w = W + abs(dx) * n_frames + 64
    coarse = rng.uniform(0, 255, (world_h // 8 + 2, world_w // 8 + 2))
    ys = np.linspace(0, coarse.shape[0] - 1.001, world_h)
    xs = np.linspace(0, coarse.shape[1] - 1.001, world_w)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    tex = (
        coarse[y0][:, x0] * (1 - wy) * (1 - wx)
        + coarse[y0][:, x0 + 1] * (1 - wy) * wx
        + coarse[y0 + 1][:, x0] * wy * (1 - wx)
        + coarse[y0 + 1][:, x0 + 1] * wy * wx
    )
    # speckle so corner detectors have features
    tex = tex + rng.normal(0, 12, tex.shape)
    tex = np.clip(tex, 0, 255).astype(np.uint8)

    # objects: static world boxes spread over the visible strip
    obj_w = rng.uniform(24, 40, n_objects)
    obj_h = rng.uniform(48, 80, n_objects)
    obj_cx = rng.uniform(60, W - 60, n_objects) + np.arange(n_objects) * dx * 2
    obj_cy = rng.uniform(60, H - 60, n_objects)
    obj_shade = rng.uniform(60, 200, n_objects)
    embs_base = rng.normal(0, 1, (n_objects, emb_dim)).astype(np.float32)
    embs_base /= np.linalg.norm(embs_base, axis=1, keepdims=True)

    frames, dets_all, embs_all = [], [], []
    for t in range(n_frames):
        ox = 32 + max(dx, 0) * t - min(dx, 0) * (n_frames - t)
        oy = 32 + max(dy, 0) * t - min(dy, 0) * (n_frames - t)
        frame = tex[oy:oy + H, ox:ox + W].copy()
        dets, embs = [], []
        for k in range(n_objects):
            # world -> image coords under the pan
            x1 = obj_cx[k] - obj_w[k] / 2 - ox + 32
            y1 = obj_cy[k] - obj_h[k] / 2 - oy + 32
            x2 = x1 + obj_w[k]
            y2 = y1 + obj_h[k]
            # paint the object (visible texture for the detectors)
            xi1, yi1 = int(max(x1, 0)), int(max(y1, 0))
            xi2, yi2 = int(min(x2, W)), int(min(y2, H))
            if xi2 > xi1 and yi2 > yi1:
                frame[yi1:yi2, xi1:xi2] = (
                    0.5 * frame[yi1:yi2, xi1:xi2] + 0.5 * obj_shade[k]
                ).astype(np.uint8)
            in_view = 0 <= x1 and x2 < W and 0 <= y1 and y2 < H
            dropped = t in dropout_frames.get(k, ())
            if in_view and not dropped:
                # deterministic per-frame detection jitter + conf
                jx = 0.5 * np.sin(0.7 * t + k)
                jy = 0.5 * np.cos(0.9 * t + 2 * k)
                conf = 0.75 + 0.2 * ((k + t) % 4) / 4.0
                dets.append([x1 + jx, y1 + jy, x2 + jx, y2 + jy, conf, 0.0])
                e = embs_base[k] + 0.02 * np.sin(
                    np.arange(emb_dim, dtype=np.float32) + t + k
                )
                embs.append(e / np.linalg.norm(e))
        frames.append(np.repeat(frame[:, :, None], 3, axis=2))
        dets_all.append(np.asarray(dets, np.float32).reshape(len(dets), 6))
        embs_all.append(
            np.asarray(embs, np.float32).reshape(len(embs), emb_dim)
        )
    return frames, dets_all, embs_all
