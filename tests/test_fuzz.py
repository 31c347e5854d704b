"""Seeded random-input fuzz over all 9 trackers: output invariants must
hold under arbitrary detection streams (random counts incl. empty
frames, duplicates, out-of-frame boxes, confidence extremes, class mix,
random embeddings). Complements test_robustness (targeted NaN/inf
injection) with breadth.

Capacities match test_robustness (max_tracks=16, max_dets=8) so the
session's jit cache is shared.
"""

import numpy as np
import pytest

import motcpp_tpu

IMG = np.zeros((480, 640, 3), np.uint8)

ALL = [
    "sort", "bytetrack", "ocsort", "deepocsort", "strongsort",
    "botsort", "boosttrack", "hybridsort", "ucmctrack",
]
KW = {
    "deepocsort": dict(embedding_off=True, cmc_off=True),
    "botsort": dict(with_reid=False),
    "hybridsort": dict(with_reid=False),
}
EMB_TRACKERS = {"deepocsort", "strongsort", "botsort", "boosttrack",
                "hybridsort"}


def _mk(name):
    kw = dict(KW.get(name, {}))
    kw.update(max_tracks=16, max_dets=8)
    return motcpp_tpu.create_tracker(name, **kw)


def _random_frame(rng, n_max=8, emb_dim=0):
    n = int(rng.integers(0, n_max + 1))
    if n == 0:
        dets = np.zeros((0, 6), np.float32)
        embs = np.zeros((0, emb_dim), np.float32) if emb_dim else None
        return dets, embs
    cx = rng.uniform(-50, 700, n)  # includes out-of-frame centers
    cy = rng.uniform(-50, 550, n)
    w = rng.uniform(1, 200, n)
    h = rng.uniform(1, 300, n)
    conf = rng.choice(
        [0.01, 0.2, 0.45, 0.61, 0.9, 0.99, 1.0], size=n
    )
    cls = rng.choice([0.0, 1.0], size=n)
    dets = np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf, cls], axis=1
    ).astype(np.float32)
    if rng.random() < 0.3 and n >= 2:
        dets[1] = dets[0]  # exact duplicate
    embs = None
    if emb_dim:
        e = rng.normal(0, 1, (n, emb_dim)).astype(np.float32)
        embs = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-9)
    return dets, embs


@pytest.mark.parametrize("name", ALL)
def test_fuzz_invariants(name):
    emb_dim = 16 if name in EMB_TRACKERS else 0
    for seed in range(4):
        rng = np.random.default_rng(1000 + seed)
        tr = _mk(name)
        seen_ids: set = set()
        for t in range(12):
            dets, embs = _random_frame(rng, emb_dim=emb_dim)
            out = np.asarray(tr.update(dets, IMG, embs))
            # shape + finiteness
            assert out.ndim == 2 and out.shape[1] == 8, out.shape
            assert np.isfinite(out).all(), (name, seed, t, out)
            if out.shape[0] == 0:
                continue
            ids = out[:, 4]
            # positive integral ids, unique within a frame
            assert (ids > 0).all() and (ids == np.round(ids)).all()
            assert len(np.unique(ids)) == out.shape[0], (name, seed, t)
            # confidence positive, bounded (boost caps at 1.0)
            assert (out[:, 5] > 0).all() and (out[:, 5] <= 1.0 + 1e-5).all()
            # class values come from the input alphabet
            assert np.isin(out[:, 6], [0.0, 1.0]).all()
            # det_ind within capacity (or -1). NOTE: it may be STALE —
            # e.g. ByteTrack skips its stage-2 block entirely when there
            # are no low-conf dets (reference: the mark_lost loop lives
            # INSIDE the non-empty guard, bytetrack.cpp:387-443), so
            # unmatched Tracked tracks are emitted carrying the det_ind
            # of their last update. Bounding by the CURRENT frame's
            # det count would therefore be wrong.
            assert (out[:, 7] >= -1 - 1e-6).all()
            assert (out[:, 7] < 8).all(), (name, seed, t)
            seen_ids.update(int(i) for i in ids)
        # ids must be bounded by total births possible
        assert all(0 < i < 10_000 for i in seen_ids)


@pytest.mark.parametrize("name", ["sort", "bytetrack", "ocsort"])
def test_fuzz_core_masked_consistency(name):
    """Functional cores under jit: emitted rows (out_mask True) must be
    finite for arbitrary random detection masks, including all-False."""
    import jax
    import jax.numpy as jnp

    if name == "sort":
        from motcpp_tpu.models.sort import SortConfig, make_sort

        init_fn, step_fn = make_sort(
            SortConfig(min_hits=1, max_tracks=8, max_dets=4))
    elif name == "bytetrack":
        from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack

        init_fn, step_fn = make_bytetrack(
            ByteTrackConfig(max_tracks=8, max_dets=4))
    else:
        from motcpp_tpu.models.ocsort import OCSortConfig, make_ocsort

        init_fn, step_fn = make_ocsort(
            OCSortConfig(min_hits=1, max_tracks=8, max_dets=4))

    step = jax.jit(step_fn)
    rng = np.random.default_rng(7)
    state = init_fn()
    for t in range(20):
        dets = rng.uniform(0, 400, (4, 6)).astype(np.float32)
        dets[:, 2:4] = dets[:, 0:2] + rng.uniform(5, 120, (4, 2))
        dets[:, 4] = rng.uniform(0, 1, 4)
        dets[:, 5] = 0.0
        mask = rng.random(4) < rng.uniform(0, 1)
        state, (out, om) = step(state, jnp.asarray(dets), jnp.asarray(mask))
        out, om = np.asarray(out), np.asarray(om)
        assert np.isfinite(out[om]).all(), (name, t)
        # no emission for masked-out detections only frames is fine;
        # emitted ids positive
        if om.any():
            assert (out[om][:, 4] > 0).all()
