"""DeepOC-SORT tests: embedding-aware association, adaptive weighting,
EMA embedding dynamics, CMC hook."""

import numpy as np
import pytest

from motcpp_tpu.models.deepocsort import DeepOCSort, compute_aw_max_metric

IMG = np.zeros((1080, 1920, 3), np.uint8)


def small(**kw):
    kw.setdefault("max_tracks", 32)
    kw.setdefault("max_dets", 16)
    return DeepOCSort(**kw)


def det(x1, y1, x2, y2, conf=0.9, cls=0):
    return [x1, y1, x2, y2, conf, cls]


def _emb(*vecs):
    e = np.asarray(vecs, np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def test_initialization_and_motion_only():
    tr = small(embedding_off=True, min_hits=1)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    assert out.shape == (1, 8)
    assert int(out[0, 4]) == 1  # no +1 on output (deepocsort.cpp:913)


def test_embeddings_disambiguate_crossing():
    """Two identical-motion boxes crossing: appearance must prevent the
    swap that pure IoU would allow."""
    tr = small(min_hits=1, w_association_emb=2.0, aw_off=True, cmc_off=True)
    ea, eb = _emb([1.0, 0.0, 0.0, 0.1], [0.0, 1.0, 0.0, 0.1])
    id_by_emb = {}
    for t in range(12):
        xa = 100 + 15 * t
        xb = 280 - 15 * t
        dets = np.array(
            [det(xa, 100, xa + 90, 300), det(xb, 100, xb + 90, 300, 0.85)],
            np.float32,
        )
        out = tr.update(dets, IMG, embs=np.stack([ea, eb]))
        for r in out:
            di = int(r[7])
            id_by_emb.setdefault(di, set()).add(int(r[4]))
    # each appearance keeps one identity through the crossing
    assert len(id_by_emb[0]) == 1
    assert len(id_by_emb[1]) == 1
    assert id_by_emb[0] != id_by_emb[1]


def test_ema_embedding_updates_state():
    tr = small(min_hits=1, alpha_fixed_emb=0.5)
    e1 = _emb([1.0, 0.0])[0]
    e2 = _emb([0.0, 1.0])[0]
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG, embs=e1[None])
    tr.update(d, IMG, embs=e2[None])
    state = tr._state
    emb = np.asarray(state.emb)[np.asarray(state.active)][0]
    # EMA pulled toward e2 but not all the way; renormalized
    assert 0.1 < emb[0] < 0.9 and emb[1] > 0.5
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)


def test_adaptive_weight_metric_discriminative_vs_flat():
    import jax.numpy as jnp

    # discriminative: clear top-1 per row/col -> near-full weight
    e = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
    m = jnp.ones((2,), bool)
    w = compute_aw_max_metric(e, m, m, 1.0, 0.5)
    assert float(w[0, 0]) > 0.7
    # ambiguous: near-equal similarities -> crushed weight
    e = jnp.asarray([[0.9, 0.89], [0.89, 0.9]])
    w = compute_aw_max_metric(e, m, m, 1.0, 0.5)
    assert float(w[0, 0]) < 0.15
    # single column: row pass skipped (reference continue), but the
    # column pass still applies: col ratio 0.4/0.5=0.8 -> weight 0.4
    e = jnp.asarray([[0.5], [0.4]])
    w = compute_aw_max_metric(e, jnp.ones((2,), bool), jnp.ones((1,), bool), 1.0, 0.5)
    assert float(w[0, 0]) == pytest.approx(0.4 * 0.5, abs=1e-5)


def test_cmc_warp_applied():
    """A translation warp shifts tracks before association, preserving
    identity under a synthetic camera pan."""
    import jax.numpy as jnp

    tr = small(min_hits=1, embedding_off=True, cmc_off=False)
    d0 = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d0, IMG)
    tr.update(d0, IMG)
    state0 = tr._state
    # feed a warp directly through the functional core
    warp = jnp.asarray([[1.0, 0.0, 50.0], [0.0, 1.0, 0.0]], jnp.float32)
    dets = jnp.zeros((16, 6), jnp.float32).at[0].set(
        jnp.asarray([150.0, 100.0, 250.0, 200.0, 0.9, 0.0])
    )
    mask = jnp.zeros((16,), bool).at[0].set(True)
    embs = jnp.ones((16, 1), jnp.float32)
    new_state, (out, om) = tr._core_step(state0, dets, mask, embs, warp=warp)
    out = np.asarray(out)[np.asarray(om)]
    assert out.shape[0] == 1
    # track followed the pan: x1 near 150
    assert abs(out[0, 0] - 150) < 8


def test_emb_dim_rebuild_on_first_embeddings():
    tr = small(min_hits=1)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)  # no embs: dim 1
    e = _emb([1.0, 0.0, 0.0])
    tr.update(d, IMG, embs=e)  # rebuilds with dim 3
    assert tr.cfg.emb_dim == 3
    out = tr.update(d, IMG, embs=e)
    assert out.shape[0] == 1


def test_ocr_rematch_after_gap():
    tr = small(min_hits=1, embedding_off=True, max_age=10)
    d = np.array([det(100, 100, 200, 200)], np.float32)
    tr.update(d, IMG)
    out = tr.update(d, IMG)
    tid = int(out[0, 4])
    for _ in range(3):
        tr.update(np.zeros((0, 6), np.float32), IMG)
    out = tr.update(d, IMG)
    assert out.shape[0] == 1 and int(out[0, 4]) == tid
