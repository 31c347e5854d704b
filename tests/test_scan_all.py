"""Every tracker core must run under lax.scan (whole-video mode) and
vmap (multi-stream mode) — the TPU execution contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.parallel import make_rollout

CORES = {
    "sort": ("motcpp_tpu.models.sort", "SortConfig", "make_sort",
             dict(min_hits=1)),
    "bytetrack": ("motcpp_tpu.models.bytetrack", "ByteTrackConfig",
                  "make_bytetrack", dict()),
    "ocsort": ("motcpp_tpu.models.ocsort", "OCSortConfig", "make_ocsort",
               dict(min_hits=1)),
    "deepocsort": ("motcpp_tpu.models.deepocsort", "DeepOCSortConfig",
                   "make_deepocsort",
                   dict(min_hits=1, embedding_off=True, cmc_off=True)),
    "strongsort": ("motcpp_tpu.models.strongsort", "StrongSortConfig",
                   "make_strongsort", dict(n_init=1, gallery_cap=4)),
    "botsort": ("motcpp_tpu.models.botsort", "BotSortConfig",
                "make_botsort", dict(with_reid=False)),
    "boosttrack": ("motcpp_tpu.models.boosttrack", "BoostTrackConfig",
                   "make_boosttrack", dict(min_hits=1)),
    "hybridsort": ("motcpp_tpu.models.hybridsort", "HybridSortConfig",
                   "make_hybridsort", dict(min_hits=1, with_reid=False)),
    "ucmctrack": ("motcpp_tpu.models.ucmctrack", "UCMCConfig",
                  "make_ucmctrack", dict()),
}


def _core(name):
    import importlib

    mod_name, cfg_name, make_name, extra = CORES[name]
    mod = importlib.import_module(mod_name)
    cfg = getattr(mod, cfg_name)(max_tracks=8, max_dets=4, **extra)
    return getattr(mod, make_name)(cfg)


def _inputs(T=6, S=2, N=4):
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    for t in range(T):
        for s in range(S):
            dets[t, s, 0] = [50 + 6 * t, 50, 120 + 6 * t, 230, 0.9, 0]
            masks[t, s, 0] = True
    return jnp.asarray(dets), jnp.asarray(masks)


@pytest.mark.parametrize("name", sorted(CORES))
def test_core_scan_and_vmap(name):
    init_fn, step_fn = _core(name)
    rollout = jax.jit(make_rollout(step_fn))
    states = jax.vmap(lambda _: init_fn())(jnp.arange(2))
    dets, masks = _inputs()
    states, (outs, oms) = rollout(states, dets, masks)
    outs, oms = np.asarray(outs), np.asarray(oms)
    assert outs.shape == (6, 2, 8, 8)
    assert np.isfinite(outs[oms]).all()
    # the persistent object is eventually emitted with one stable id
    assert oms.sum() > 0, name
    ids = {int(i) for i in outs[oms][:, 4]}
    assert len(ids) == 1, (name, ids)
