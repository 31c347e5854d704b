"""Base tracker machinery: fixed-capacity padding, the universal
``update(dets, img, embs) -> (M, 8)`` wrapper, and shared utilities.

TPU-first re-design of the reference's BaseTracker (reference:
include/motcpp/tracker.hpp:33-142, src/tracker.cpp:17-186). The dynamic
C++ track vectors become fixed-capacity struct-of-arrays state pytrees;
each concrete tracker supplies a pure, jit-compiled

    step(state, dets (N, D), det_mask (N,), embs (N, E)) -> (state, out)

and this wrapper handles host-side concerns: input validation, padding
detections to the static capacity, lazy first-frame setup (frame W/H),
jit caching, and compacting the masked (K, 8) output to the dense (M, 8)
result the reference API returns.
"""

from __future__ import annotations

import colorsys
from typing import Any

import jax
import numpy as np

# Track lifecycle states (reference: tracker.hpp:22-27)
STATE_NEW = 0
STATE_TRACKED = 1
STATE_LOST = 2
STATE_REMOVED = 3


def pad_rows(arr: np.ndarray, capacity: int, fill: float = 0.0) -> np.ndarray:
    """Pad/validate leading axis to a static capacity."""
    n = arr.shape[0]
    if n > capacity:
        raise ValueError(
            f"{n} rows exceed the configured capacity {capacity}; "
            f"construct the tracker with a larger max_dets"
        )
    out = np.full((capacity,) + arr.shape[1:], fill, arr.dtype)
    out[:n] = arr
    return out


def id_to_color(track_id: int, saturation: float = 0.75, value: float = 0.95):
    """Deterministic per-ID BGR color via hue hashing (reference:
    src/tracker.cpp:127-158). Host-side visualization helper only."""
    hue = (hash(int(track_id)) % 360) / 360.0
    r, g, b = colorsys.hsv_to_rgb(hue, saturation, value)
    return (int(b * 255), int(g * 255), int(r * 255))


class BaseTrackerWrapper:
    """Host-facing tracker with the reference's public contract.

    Subclasses set ``self._cfg`` (a hashable config whose fields are
    static under jit), implement :meth:`_init_state` and provide a pure
    ``_step(state, dets, det_mask, embs)``; everything else is shared.

    Input contract (reference: src/tracker.cpp:108-125): dets is (n, 6)
    AABB ``[x1, y1, x2, y2, conf, cls]`` or (n, 7) OBB
    ``[cx, cy, w, h, angle, conf, cls]``; embs is (n, E) or None.
    Output: (M, 8) ``[x1, y1, x2, y2, id, conf, cls, det_ind]``.
    """

    #: detection feature width in AABB mode
    DET_COLS = 6

    def __init__(self, max_dets: int = 128, emb_dim: int = 0):
        self.max_dets = int(max_dets)
        self.emb_dim = int(emb_dim)
        self.frame_width = 0
        self.frame_height = 0
        self._first_frame_processed = False
        self._first_dets_processed = False
        self.is_obb = False
        self._state = None
        self._jit_step = None

    # ---------------------------------------------------------------- API
    def update(
        self,
        dets: np.ndarray,
        img: np.ndarray | None = None,
        embs: np.ndarray | None = None,
        warp: np.ndarray | None = None,
    ) -> np.ndarray:
        """Process one frame. ``warp`` optionally injects a precomputed
        (2, 3) camera-motion affine, bypassing the tracker's own CMC
        estimator — the warp analogue of passing precomputed ``embs``
        instead of running the ReID backbone (SURVEY §7.6; the reference
        supports only the embs half, mot17_dataset.cpp:244-296)."""
        dets = np.asarray(dets, np.float32)
        if dets.size == 0:
            dets = dets.reshape(0, 7 if self.is_obb else self.DET_COLS)
        self._check_inputs(dets, img, embs)
        self._setup_first_frame(dets, img)

        n = dets.shape[0]
        padded = pad_rows(dets, self.max_dets)
        det_mask = np.zeros(self.max_dets, bool)
        det_mask[:n] = True

        if embs is not None and np.asarray(embs).size > 0:
            embs = np.asarray(embs, np.float32)
            if self.emb_dim == 0:
                self.emb_dim = embs.shape[1]
                self._jit_step = None  # retrace with embedding inputs
            emb_pad = pad_rows(embs, self.max_dets)
        else:
            emb_pad = np.zeros((self.max_dets, max(self.emb_dim, 1)), np.float32)

        if warp is None:
            warp = self._compute_warp(img, dets)
        if warp is None:
            warp = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        warp = np.asarray(warp, np.float32).reshape(2, 3)

        if self._state is None:
            self._state = self._init_state()
        if self._jit_step is None:
            self._jit_step = jax.jit(self._step)

        self._state, (out, out_mask) = self._jit_step(
            self._state, padded, det_mask, emb_pad, warp
        )
        out = np.asarray(out)
        out_mask = np.asarray(out_mask)
        return out[out_mask]

    def reset(self):
        """Drop all tracks and restart frame counting (reference:
        src/tracker.cpp:48-56; note the reference's static ID counters
        are *not* reset there — ours are per-instance and do reset,
        which only affects absolute ID values, not any metric)."""
        self._state = None
        self._first_frame_processed = False
        self._first_dets_processed = False

    # ------------------------------------------------------------ helpers
    def _check_inputs(self, dets, img, embs):
        if dets.size > 0 and dets.shape[1] not in (6, 7):
            raise ValueError(
                "Detections must have 6 (AABB) or 7 (OBB) columns"
            )
        if embs is not None and np.asarray(embs).size > 0:
            if dets.shape[0] != np.asarray(embs).shape[0]:
                raise ValueError(
                    "Detections and embeddings must have same number of rows"
                )

    def _setup_first_frame(self, dets, img):
        # lazy frame-size capture (reference: src/tracker.cpp:166-172)
        if not self._first_frame_processed and img is not None:
            self.frame_height = int(img.shape[0])
            self.frame_width = int(img.shape[1])
            self._first_frame_processed = True
        # detection-format autodetect (reference: src/tracker.cpp:174-183)
        if not self._first_dets_processed and dets.size > 0:
            self.is_obb = dets.shape[1] == 7
            self._first_dets_processed = True

    def _compute_warp(self, img, dets):
        """Camera-motion warp hook: CMC-capable trackers return a (2, 3)
        affine from their estimator; None means identity."""
        return None

    # ------------------------------------------------------ to implement
    def _init_state(self) -> Any:
        raise NotImplementedError

    def _step(self, state, dets, det_mask, embs, warp):
        raise NotImplementedError
