"""Multi-stream / multi-device tests (SURVEY.md §2.8: stream parallelism
replaces the reference's one-tracker-per-thread advice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motcpp_tpu.models.sort import SortConfig, make_sort
from motcpp_tpu.parallel import MultiStreamRunner, make_rollout


def _mini_inputs(T=4, S=4, N=4):
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    for s in range(S):
        for t in range(T):
            dets[t, s, 0] = [10 * s + t, 20, 10 * s + t + 60, 140, 0.9, 0]
            masks[t, s, 0] = True
    return jnp.asarray(dets), jnp.asarray(masks)


def test_rollout_scan_shapes():
    cfg = SortConfig(min_hits=1, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    rollout = make_rollout(step_fn)
    T, S = 4, 4
    states = jax.vmap(lambda _: init_fn())(jnp.arange(S))
    dets, masks = _mini_inputs(T, S)
    states, (outs, oms) = jax.jit(rollout)(states, dets, masks)
    assert outs.shape == (T, S, 8, 8)
    assert np.asarray(oms).sum() == T * S  # one track per stream per frame


def test_multistream_runner_single_vs_sharded_equal():
    """Sharded (8-device) execution must be bit-identical to single-device."""
    cfg = SortConfig(min_hits=1, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    dets, masks = _mini_inputs(T=4, S=8)

    single = MultiStreamRunner(init_fn, step_fn, 8, devices=jax.devices()[:1])
    outs1, om1 = single.run(dets, masks)

    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    sharded = MultiStreamRunner(init_fn, step_fn, 8, devices=jax.devices()[:8])
    outs8, om8 = sharded.run(dets, masks)

    np.testing.assert_allclose(np.asarray(outs1), np.asarray(outs8), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(om1), np.asarray(om8))


def test_runner_carries_state_between_calls():
    cfg = SortConfig(min_hits=1, max_age=5, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, 4, devices=jax.devices()[:1])
    dets, masks = _mini_inputs(T=4, S=4)
    outs_a, om_a = runner.run(dets, masks)
    outs_b, om_b = runner.run(dets, masks)  # continues the same tracks
    ids_a = np.asarray(outs_a)[..., 4][np.asarray(om_a)]
    ids_b = np.asarray(outs_b)[..., 4][np.asarray(om_b)]
    assert set(ids_b.astype(int)) == set(ids_a.astype(int))


def test_streams_must_divide_devices():
    cfg = SortConfig(max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    with pytest.raises(ValueError):
        MultiStreamRunner(init_fn, step_fn, 5, devices=jax.devices()[:2])


def test_graft_entry_contract():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out, out_mask = jax.jit(fn)(*args)
    assert out.shape[-1] == 8
    mod.dryrun_multichip(8)


def test_multistream_with_embeddings_sharded():
    """ReID trackers scale multi-stream too: strongsort with per-det
    embeddings through shard_map over all 8 virtual devices."""
    import numpy as np

    from motcpp_tpu.models.strongsort import StrongSortConfig, make_strongsort
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N, D = 16, 6, 4, 8
    cfg = StrongSortConfig(n_init=1, max_tracks=8, max_dets=N, emb_dim=D)
    init_fn, step_fn = make_strongsort(cfg)
    runner = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, with_embs=True
    )
    rng = np.random.default_rng(0)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    embs = rng.normal(0, 1, (T, S, N, D)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    for t in range(T):
        for i in range(2):
            dets[t, :, i] = [100 + 120 * i + 3 * t, 100, 180 + 120 * i + 3 * t,
                             300, 0.9, 0]
            masks[t, :, i] = True
    # identity-stable embeddings per object across time
    embs = np.broadcast_to(embs[0][:, :, :], (T, S, N, D)).copy()
    outs, out_masks = runner.run(dets, masks, embs)
    assert outs.shape == (T, S, 8, 8)
    assert bool(np.asarray(out_masks[-1]).any())
    # mismatched usage errors clearly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        runner.run(dets, masks)  # missing embs


def test_multistream_checkpoint_resume_bit_exact(tmp_path):
    """Streaming resume: save the sharded carry mid-stream, reload into a
    fresh runner, continue — outputs must equal an uninterrupted run
    (SURVEY.md §5 checkpoint/resume aux subsystem, multi-stream case)."""
    import numpy as np

    from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack
    from motcpp_tpu.parallel import MultiStreamRunner
    from motcpp_tpu.utils.checkpoint import load_state, save_state

    S, T, N = 16, 12, 4
    cfg = ByteTrackConfig(max_tracks=8, max_dets=N)
    init_fn, step_fn = make_bytetrack(cfg)
    rng = np.random.default_rng(0)
    dets = rng.uniform(100, 900, (T, S, N, 6)).astype(np.float32)
    dets[..., 2:4] = dets[..., 0:2] + 80.0
    dets[..., 4] = 0.9
    dets[..., 5] = 0.0
    masks = np.ones((T, S, N), bool)

    # uninterrupted
    r_full = MultiStreamRunner(init_fn, step_fn, n_streams=S)
    outs_full, masks_full = r_full.run(dets, masks)

    # first half, checkpoint, resume in a FRESH runner
    r_a = MultiStreamRunner(init_fn, step_fn, n_streams=S)
    r_a.run(dets[: T // 2], masks[: T // 2])
    save_state(r_a.states, tmp_path / "carry.npz")

    r_b = MultiStreamRunner(init_fn, step_fn, n_streams=S)
    restored = load_state(r_b.init_states(), tmp_path / "carry.npz")
    outs_b, masks_b = r_b.run(dets[T // 2 :], masks[T // 2 :], states=restored)

    np.testing.assert_array_equal(
        np.asarray(masks_full[T // 2 :]), np.asarray(masks_b)
    )
    np.testing.assert_array_equal(
        np.asarray(outs_full[T // 2 :]), np.asarray(outs_b)
    )


def test_run_with_caller_states_does_not_donate_them():
    """ADVICE r1: run(states=...) must not invalidate the caller's pytree
    (the rollout donates its state argument; a copy shields the caller)."""
    cfg = SortConfig(min_hits=1, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=8)
    dets, masks = _mini_inputs(T=2, S=8)
    saved = runner.init_states()
    out1 = runner.run(dets, masks, states=saved)
    # the caller-retained pytree must still be readable and reusable
    _ = jax.tree_util.tree_map(np.asarray, saved)
    out2 = runner.run(dets, masks, states=saved)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))


def test_runner_states_property_survives_run():
    """runner.states is documented checkpointable: a snapshot taken
    before the next run() must stay readable (the rollout donates the
    carry, so the property must hand out a copy — the same defect class
    fixed for TrackingService.states in ADVICE r2)."""
    cfg = SortConfig(min_hits=1, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=8)
    dets, masks = _mini_inputs(T=2, S=8)
    runner.run(dets, masks)
    snap = runner.states
    runner.run(dets, masks)  # donates the live carry
    # every leaf of the snapshot must still be materializable
    leaves = jax.tree_util.tree_map(np.asarray, snap)
    assert jax.tree_util.tree_leaves(leaves)


def test_mesh_metrics_aggregation_matches_unsharded():
    """psum/all_gather metric aggregation on the 8-device mesh must equal
    the plain unsharded reduction (SURVEY.md §2.8: collectives appear
    only in result gathering; VERDICT r1 #10)."""
    from jax.sharding import Mesh

    from motcpp_tpu.parallel import (
        MultiStreamRunner,
        emission_stats,
        per_stream_emissions,
        shard_over_streams,
    )

    cfg = SortConfig(min_hits=1, max_tracks=8, max_dets=4)
    init_fn, step_fn = make_sort(cfg)
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=8)
    T, S = 5, 8
    dets, masks = _mini_inputs(T=T, S=S)
    # silence one stream to make active_streams nontrivial
    masks = masks.at[:, 3].set(False)
    _, out_masks = runner.run(dets, masks)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("streams",))
    out_masks_sharded = shard_over_streams(mesh, out_masks)
    stats = emission_stats(out_masks_sharded, mesh)

    om = np.asarray(out_masks)
    assert stats["total_emissions"] == int(om.sum())
    assert stats["frames_processed"] == T * S
    assert stats["active_streams"] == int(om.any(axis=(0, 2)).sum()) == S - 1
    assert stats["peak_tracks_per_frame"] == int(om.sum(axis=2).max())

    per_stream = np.asarray(per_stream_emissions(out_masks_sharded, mesh))
    np.testing.assert_array_equal(per_stream, om.sum(axis=(0, 2)))
    assert per_stream[3] == 0


def test_rollout_warp_leg_identity_noop():
    """Identity warps through the warp leg == no-warp rollout, and a
    translating warp changes the output (the CMC application path is
    live inside the scanned program)."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.models.botsort import BotSortConfig, make_botsort
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N = 2, 6, 8
    cfg = BotSortConfig(max_tracks=16, max_dets=N, with_reid=False)
    init_fn, step_fn = make_botsort(cfg)
    rng = np.random.default_rng(0)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    for t in range(T):
        for i in range(3):
            x = 50 + 40 * i + 3 * t
            dets[t, :, i] = [x, 60, x + 30, 140, 0.9, 0]
            masks[t, :, i] = True

    dev = jax.devices()[:1]
    base = MultiStreamRunner(init_fn, step_fn, n_streams=S, devices=dev)
    o0, m0 = base.run(jnp.asarray(dets), jnp.asarray(masks))

    runner = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, devices=dev, with_warps=True
    )
    ident = np.tile(
        np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (T, S, 1, 1)
    )
    o1, m1 = runner.run(
        jnp.asarray(dets), jnp.asarray(masks), warps=jnp.asarray(ident)
    )
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_allclose(
        np.asarray(o0)[np.asarray(m0)], np.asarray(o1)[np.asarray(m1)],
        rtol=0, atol=1e-5,
    )

    moving = ident.copy()
    moving[..., 0, 2] = 25.0  # constant 25px x-shift per frame
    runner2 = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, devices=dev, with_warps=True
    )
    o2, m2 = runner2.run(
        jnp.asarray(dets), jnp.asarray(masks), warps=jnp.asarray(moving)
    )
    assert not np.allclose(
        np.asarray(o1)[np.asarray(m1)][:, :4],
        np.asarray(o2)[np.asarray(m2)][:, :4],
    )


def test_rollout_combined_embs_and_warps():
    """make_rollout_general with both optional legs active."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.models.botsort import BotSortConfig, make_botsort
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N, D = 2, 4, 6, 8
    cfg = BotSortConfig(max_tracks=16, max_dets=N, with_reid=True,
                        emb_dim=D)
    init_fn, step_fn = make_botsort(cfg)
    rng = np.random.default_rng(1)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    for t in range(T):
        for i in range(2):
            x = 40 + 120 * i + 5 * t
            dets[t, :, i] = [x, 50, x + 60, 200, 0.9, 0]
            masks[t, :, i] = True
    embs = rng.normal(0, 1, (T, S, N, D)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True) + 1e-9
    warps = np.tile(np.asarray([[1, 0, 2], [0, 1, 1]], np.float32),
                    (T, S, 1, 1))
    runner = MultiStreamRunner(
        init_fn, step_fn, n_streams=S, devices=jax.devices()[:1],
        with_embs=True, with_warps=True,
    )
    outs, out_masks = runner.run(
        jnp.asarray(dets), jnp.asarray(masks),
        embs=jnp.asarray(embs), warps=jnp.asarray(warps),
    )
    outs = np.asarray(outs)
    assert np.isfinite(outs[np.asarray(out_masks)]).all()
    assert int(np.asarray(out_masks).sum()) > 0


def test_rollout_live_cmc_matches_precomputed_warps():
    """cmc_fn switches the warp leg to LIVE in-graph estimation from
    grayscale frames (ecc_jax_batch inside the scanned program, the TPU
    replacement for the reference's per-frame host ECC, ecc.cpp:22-98):
    outputs must equal the precomputed-warps rollout fed the warps the
    same estimator computes on the host, with the prev-frame carry
    surviving a split across run() calls, on one device and sharded."""
    import jax
    import jax.numpy as jnp

    from motcpp_tpu.models.botsort import BotSortConfig, make_botsort
    from motcpp_tpu.motion.cmc import ecc_jax_batch
    from motcpp_tpu.parallel import MultiStreamRunner

    S, T, N = 2, 6, 8
    h, w = 64, 96
    rng = np.random.default_rng(7)

    # textured per-stream scenes panning at different speeds
    def textured(seed):
        im = np.zeros((h, w * 3), np.float32)
        r = np.random.default_rng(seed)
        for scale in (4, 8, 16):
            small = r.random((h // scale + 2, w * 3 // scale + 2))
            im += np.kron(small, np.ones((scale, scale)))[:h, :w * 3]
        return (im / im.max() * 255).astype(np.float32)

    scenes = [textured(40 + s) for s in range(S)]
    pans = [3, 5]  # px/frame at frame scale
    frames = np.zeros((T, S, h, w), np.float32)
    for t in range(T):
        for s in range(S):
            x0 = pans[s] * t
            frames[t, s] = scenes[s][:, x0:x0 + w]

    cfg = BotSortConfig(max_tracks=16, max_dets=N, with_reid=False)
    init_fn, step_fn = make_botsort(cfg)
    dets = np.zeros((T, S, N, 6), np.float32)
    masks = np.zeros((T, S, N), bool)
    for t in range(T):
        for s in range(S):
            x = 20 + pans[s] * t  # static object dragged by the pan
            dets[t, s, 0] = [x, 10, x + 14, 40, 0.9, 0]
            masks[t, s, 0] = True

    scale = 0.5  # pretend frames were downscaled by this for CMC
    # host reference: same estimator per consecutive pair, identity first
    warps = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32),
                    (T, S, 1, 1))
    for t in range(1, T):
        wz, _ = ecc_jax_batch(jnp.asarray(frames[t - 1]),
                              jnp.asarray(frames[t]))
        wz = np.asarray(wz).copy()
        wz[:, :, 2] /= scale
        warps[t] = wz

    dev1 = jax.devices()[:1]
    base = MultiStreamRunner(init_fn, step_fn, n_streams=S, devices=dev1,
                             with_warps=True)
    o0, m0 = base.run(jnp.asarray(dets), jnp.asarray(masks),
                      warps=jnp.asarray(warps))

    live = MultiStreamRunner(init_fn, step_fn, n_streams=S, devices=dev1,
                             cmc_fn=ecc_jax_batch, cmc_scale=scale)
    # split across two run() calls: the prev-frame carry must bridge
    o1a, m1a = live.run(jnp.asarray(dets[:3]), jnp.asarray(masks[:3]),
                        frames=jnp.asarray(frames[:3]))
    o1b, m1b = live.run(jnp.asarray(dets[3:]), jnp.asarray(masks[3:]),
                        frames=jnp.asarray(frames[3:]))
    m1 = np.concatenate([np.asarray(m1a), np.asarray(m1b)])
    o1 = np.concatenate([np.asarray(o1a), np.asarray(o1b)])
    np.testing.assert_array_equal(np.asarray(m0), m1)
    np.testing.assert_allclose(np.asarray(o0)[np.asarray(m0)], o1[m1],
                               rtol=0, atol=1e-4)

    if len(jax.devices()) >= 2:
        sharded = MultiStreamRunner(
            init_fn, step_fn, n_streams=S, devices=jax.devices()[:2],
            cmc_fn=ecc_jax_batch, cmc_scale=scale,
        )
        o2, m2 = sharded.run(jnp.asarray(dets), jnp.asarray(masks),
                             frames=jnp.asarray(frames))
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m2))
        np.testing.assert_allclose(
            np.asarray(o0)[np.asarray(m0)], np.asarray(o2)[np.asarray(m2)],
            rtol=0, atol=1e-4,
        )

    # the warp leg must be live: a no-CMC rollout diverges on this scene
    plain = MultiStreamRunner(init_fn, step_fn, n_streams=S, devices=dev1)
    o3, m3 = plain.run(jnp.asarray(dets), jnp.asarray(masks))
    assert (np.asarray(m3) != np.asarray(m0)).any() or not np.allclose(
        np.asarray(o3)[np.asarray(m3)][:, :4], np.asarray(o0)[np.asarray(m0)][:, :4]
    )


def test_runner_live_reid_matches_precomputed_and_shards():
    """embed_fn switches the embedding leg to raw crops with the ReID
    CNN inside the scanned program; outputs must equal the
    precomputed-embeddings rollout fed the same features, on one device
    and sharded over four."""
    from motcpp_tpu.appearance.osnet import init_params, osnet_x0_25
    from motcpp_tpu.appearance.reid import make_embed_fn
    from motcpp_tpu.models.botsort import BotSortConfig, make_botsort

    T, S, N, hw, D = 4, 4, 6, (32, 16), 32
    model = osnet_x0_25(feature_dim=D)
    variables = init_params(model, hw, seed=0)
    embed = make_embed_fn(model, variables)

    rng = np.random.default_rng(3)
    dets = np.zeros((T, S, N, 6), np.float32)
    cx = rng.uniform(100, 500, (T, S, N))
    cy = rng.uniform(100, 400, (T, S, N))
    dets[..., 0] = cx - 30
    dets[..., 1] = cy - 60
    dets[..., 2] = cx + 30
    dets[..., 3] = cy + 60
    dets[..., 4] = rng.uniform(0.6, 1.0, (T, S, N))
    masks = rng.random((T, S, N)) < 0.8
    crops = rng.integers(0, 255, (T, S, N) + hw + (3,)).astype(np.uint8)

    cfg = BotSortConfig(max_tracks=16, max_dets=N, emb_dim=D, with_reid=True)
    init_fn, step_fn = make_botsort(cfg)

    ra = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed)
    outs_a, masks_a = ra.run(jnp.asarray(dets), jnp.asarray(masks),
                             embs=jnp.asarray(crops))

    embs = np.asarray(jax.jit(embed)(
        jnp.asarray(crops.reshape((-1,) + hw + (3,)))
    )).reshape(T, S, N, D)
    rb = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], with_embs=True)
    outs_b, masks_b = rb.run(jnp.asarray(dets), jnp.asarray(masks),
                             embs=jnp.asarray(embs))
    np.testing.assert_array_equal(np.asarray(masks_a), np.asarray(masks_b))
    np.testing.assert_allclose(np.asarray(outs_a), np.asarray(outs_b),
                               atol=1e-5)
    assert int(np.asarray(masks_a).sum()) > 0

    rs = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:4], embed_fn=embed)
    outs_s, masks_s = rs.run(jnp.asarray(dets), jnp.asarray(masks),
                             embs=jnp.asarray(crops))
    np.testing.assert_array_equal(np.asarray(masks_a), np.asarray(masks_s))
    np.testing.assert_allclose(np.asarray(outs_a), np.asarray(outs_s),
                               atol=1e-5)


def _live_reid_scene(T=4, S=4, N=6, hw=(32, 16), D=32, seed=3,
                     valid_p=0.8):
    from motcpp_tpu.appearance.osnet import init_params, osnet_x0_25
    from motcpp_tpu.appearance.reid import make_embed_fn

    model = osnet_x0_25(feature_dim=D)
    variables = init_params(model, hw, seed=0)
    embed = make_embed_fn(model, variables)
    rng = np.random.default_rng(seed)
    dets = np.zeros((T, S, N, 6), np.float32)
    cx = rng.uniform(100, 500, (T, S, N))
    cy = rng.uniform(100, 400, (T, S, N))
    dets[..., 0] = cx - 30
    dets[..., 1] = cy - 60
    dets[..., 2] = cx + 30
    dets[..., 3] = cy + 60
    dets[..., 4] = rng.uniform(0.6, 1.0, (T, S, N))
    masks = rng.random((T, S, N)) < valid_p
    crops = rng.integers(0, 255, (T, S, N) + hw + (3,)).astype(np.uint8)
    return embed, dets, masks, crops


def test_embed_valid_crops_budgeted_matches_plain_on_valid_slots():
    """The compaction gather/scatter must reproduce the plain full-batch
    embeddings exactly on valid slots and zero the rest (the reference
    embeds only the frame's real crop list, onnx_backend.cpp:110-133)."""
    from motcpp_tpu.appearance.reid import embed_valid_crops

    embed, dets, masks, crops = _live_reid_scene(T=1, S=3, N=4)
    d, m, c = (jnp.asarray(dets[0]), jnp.asarray(masks[0]),
               jnp.asarray(crops[0]))
    plain = np.asarray(embed_valid_crops(embed, c, d, m, budget=None))
    n_valid = int(masks[0].sum())
    capped = np.asarray(jax.jit(
        lambda c_, d_, m_: embed_valid_crops(embed, c_, d_, m_,
                                             budget=n_valid)
    )(c, d, m))
    np.testing.assert_allclose(capped[masks[0]], plain[masks[0]], atol=1e-5)
    assert (capped[~masks[0]] == 0).all()
    # budget >= S*N degenerates to the plain path (invalid slots keep
    # their CNN(garbage) features, historical behavior)
    full = np.asarray(embed_valid_crops(embed, c, d, m, budget=12))
    np.testing.assert_array_equal(full, plain)
    with pytest.raises(ValueError, match="budget"):
        embed_valid_crops(embed, c, d, m, budget=0)


def test_runner_crop_budget_matches_uncapped_and_shards():
    """With budget >= the number of valid detections per frame, the
    budgeted live-ReID runner must emit the same tracks as the uncapped
    one (this also proves trackers never read masked-slot embeddings);
    an overflowing budget must still run and emit finite tracks
    (overflow dets associate by motion only); sharded == single."""
    from motcpp_tpu.models.botsort import BotSortConfig, make_botsort

    T, S, N, D = 4, 4, 6, 32
    embed, dets, masks, crops = _live_reid_scene(T=T, S=S, N=N, D=D)
    cfg = BotSortConfig(max_tracks=16, max_dets=N, emb_dim=D, with_reid=True)
    init_fn, step_fn = make_botsort(cfg)
    dets_j, masks_j, crops_j = map(jnp.asarray, (dets, masks, crops))

    r0 = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed)
    outs_0, masks_0 = r0.run(dets_j, masks_j, embs=crops_j)

    budget = int(masks.sum(axis=(1, 2)).max())  # covers every frame
    rb = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed,
                           crop_budget=budget)
    outs_b, masks_b = rb.run(dets_j, masks_j, embs=crops_j)
    np.testing.assert_array_equal(np.asarray(masks_0), np.asarray(masks_b))
    np.testing.assert_allclose(np.asarray(outs_0), np.asarray(outs_b),
                               atol=1e-5)
    assert int(np.asarray(masks_b).sum()) > 0

    # sharded: per-shard budget must cover each shard's max valid count
    per_shard = int(masks.reshape(T, 4, S // 4, N).sum(axis=(2, 3)).max())
    rs = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:4], embed_fn=embed,
                           crop_budget=per_shard * 4)
    outs_s, masks_s = rs.run(dets_j, masks_j, embs=crops_j)
    np.testing.assert_array_equal(np.asarray(masks_0), np.asarray(masks_s))
    np.testing.assert_allclose(np.asarray(outs_0), np.asarray(outs_s),
                               atol=1e-5)

    # overflow: tighter budget than the valid count still runs clean
    ro = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed,
                           crop_budget=max(1, budget // 3))
    outs_o, masks_o = ro.run(dets_j, masks_j, embs=crops_j)
    om = np.asarray(masks_o)
    assert om.sum() > 0
    assert np.isfinite(np.asarray(outs_o)[om]).all()

    with pytest.raises(ValueError, match="crop_budget"):
        MultiStreamRunner(init_fn, step_fn, n_streams=S,
                          devices=jax.devices()[:1], with_embs=True,
                          crop_budget=4)
    with pytest.raises(ValueError, match="divide"):
        MultiStreamRunner(init_fn, step_fn, n_streams=S,
                          devices=jax.devices()[:4], embed_fn=embed,
                          crop_budget=6)


def test_runner_emb_cadence_shards_and_persists_phase():
    """Embedding cadence (VERDICT r3 #1c): with emb_cadence=k only the
    streams gated by (frame + global_stream_id) % k == 0 are embedded
    each frame. Properties pinned here:

      * sharded (4 devices) == single device bit-exact — the gate uses
        GLOBAL stream ids, not shard-local ones;
      * the frame phase persists across run() calls: two T=1 ticks
        equal one T=2 rollout frame-for-frame (serving ticks are T=1);
      * k=1 is bit-identical to no cadence;
      * emb_cadence without embed_fn raises.
    """
    from motcpp_tpu.models.deepocsort import (
        DeepOCSortConfig,
        make_deepocsort,
    )

    T, S, N, D = 4, 8, 6, 32
    embed, dets, masks, crops = _live_reid_scene(T=T, S=S, N=N, D=D)
    cfg = DeepOCSortConfig(min_hits=1, max_tracks=16, max_dets=N,
                           emb_dim=D, cmc_off=True)
    init_fn, step_fn = make_deepocsort(cfg)
    dets_j, masks_j, crops_j = map(jnp.asarray, (dets, masks, crops))

    r1 = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed,
                           emb_cadence=3)
    outs_1, masks_1 = r1.run(dets_j, masks_j, embs=crops_j)
    assert int(np.asarray(masks_1).sum()) > 0

    rs = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:4], embed_fn=embed,
                           emb_cadence=3)
    outs_s, masks_s = rs.run(dets_j, masks_j, embs=crops_j)
    np.testing.assert_array_equal(np.asarray(masks_1), np.asarray(masks_s))
    np.testing.assert_allclose(np.asarray(outs_1), np.asarray(outs_s),
                               atol=1e-5)

    # phase persistence: T=1 ticks == one rollout, frame for frame
    rt = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                           devices=jax.devices()[:1], embed_fn=embed,
                           emb_cadence=3)
    for t in range(T):
        o_t, m_t = rt.run(dets_j[t:t + 1], masks_j[t:t + 1],
                          embs=crops_j[t:t + 1])
        np.testing.assert_array_equal(
            np.asarray(m_t)[0], np.asarray(masks_1)[t]
        )
        np.testing.assert_allclose(
            np.asarray(o_t)[0], np.asarray(outs_1)[t], atol=1e-5
        )
    # reset() rewinds the phase
    rt.reset()
    o_r, m_r = rt.run(dets_j[:1], masks_j[:1], embs=crops_j[:1])
    np.testing.assert_array_equal(np.asarray(m_r)[0], np.asarray(masks_1)[0])

    # k=1 == no cadence, bit for bit
    rk1 = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                            devices=jax.devices()[:1], embed_fn=embed,
                            emb_cadence=1)
    r_plain = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                                devices=jax.devices()[:1], embed_fn=embed)
    outs_k1, masks_k1 = rk1.run(dets_j, masks_j, embs=crops_j)
    outs_p, masks_p = r_plain.run(dets_j, masks_j, embs=crops_j)
    np.testing.assert_array_equal(np.asarray(masks_k1), np.asarray(masks_p))
    np.testing.assert_array_equal(np.asarray(outs_k1), np.asarray(outs_p))

    with pytest.raises(ValueError, match="emb_cadence"):
        MultiStreamRunner(init_fn, step_fn, n_streams=S,
                          devices=jax.devices()[:1], with_embs=True,
                          emb_cadence=2)


def test_emb_cadence_gate_embeds_exactly_the_phased_streams():
    """Mechanism pin for the cadence gate: a probe step that emits each
    det's embedding norm shows stream s carries nonzero det features
    exactly on frames where (t + s) % k == 0, and zeros elsewhere."""
    from motcpp_tpu.parallel.streams import make_rollout_general

    T, S, N, k = 6, 8, 3, 3
    hw = (8, 8)

    def embed(crops):  # (B, 8, 8, 3) -> (B, 4) constant unit features
        B = crops.shape[0]
        return jnp.ones((B, 4), jnp.float32) * 0.5

    def probe_step(state, d, m, e):
        return state, (jnp.linalg.norm(e, axis=-1), m)

    rollout = make_rollout_general(
        probe_step, with_embs=True, embed_fn=embed, emb_cadence=k
    )
    dets = jnp.zeros((T, S, N, 6), jnp.float32)
    dets = dets.at[..., 4].set(0.9)
    masks = jnp.ones((T, S, N), bool)
    crops = jnp.zeros((T, S, N) + hw + (3,), jnp.uint8)
    states = jnp.zeros((S,), jnp.float32)
    stream_ids = jnp.arange(S, dtype=jnp.int32)
    _, (norms, _) = jax.jit(rollout)(states, 2, stream_ids, dets, masks,
                                     crops)
    norms = np.asarray(norms)  # (T, S, N)
    for t in range(T):
        for s in range(S):
            gated = (2 + t + s) % k == 0  # frame0=2 offsets the phase
            if gated:
                assert (norms[t, s] > 0.9).all(), (t, s)
            else:
                assert (norms[t, s] == 0).all(), (t, s)


@pytest.mark.slow
def test_dryrun_multihost_two_processes():
    """Two-process jax.distributed dryrun (VERDICT r3 #9): one sharded
    multi-stream step spanning process boundaries over a localhost TCP
    coordinator (the DCN mechanism), per-stream emissions bit-exact vs
    single-process. Skips gracefully where the distributed runtime is
    unavailable (the script itself asserts correctness)."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "scripts" / "dryrun_multihost.py"
    proc = subprocess.run(
        [sys.executable, str(script), "--procs", "2", "--port", "12931"],
        capture_output=True, text=True, timeout=540,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode != 0 and (
        "distributed" in out and "unavailable" in out
        or "Address already in use" in out
    ):
        pytest.skip(f"distributed runtime unavailable: {out[-200:]}")
    assert proc.returncode == 0, out[-2000:]
    assert "dryrun_multihost OK" in out


def _stub_embed(D=8):
    def embed_fn(crops):
        v = jnp.mean(crops.astype(jnp.float32), axis=(1, 2, 3))
        return jnp.zeros((crops.shape[0], D), jnp.float32).at[:, 0].set(
            v + 1.0
        )

    return embed_fn


def test_priority_budget_embeds_novel_and_crowded_first():
    """emb_priority: the per-frame CNN budget goes to births/
    reappearances (novelty) and ambiguous overlaps (crowding) before
    stable isolated dets — and never exceeds the budget or touches
    invalid slots (parallel.streams.embedding_priority)."""
    from motcpp_tpu.parallel.streams import make_rollout_general

    S, N, T = 2, 4, 5
    rollout = make_rollout_general(
        lambda st, d, m, e: (st, (e, m)),  # echo embeddings
        with_embs=True, embed_fn=_stub_embed(), crop_budget=3,
        emb_priority=True, priority_rot=4,
    )
    rng = np.random.default_rng(0)
    dets = np.zeros((T, S, N, 6), np.float32)
    dets[:, 0, 0, :4] = [10, 10, 50, 90]
    dets[:, 0, 1, :4] = [200, 10, 240, 90]
    dets[2:, 0, 2, :4] = [400, 300, 460, 420]  # appears at t=2
    dets[:, 1, 0, :4] = [600, 500, 660, 640]
    dets[..., 4] = 0.9
    masks = np.zeros((T, S, N), bool)
    masks[:, 0, :2] = True
    masks[2:, 0, 2] = True
    masks[:, 1, 0] = True
    crops = rng.integers(0, 255, (T, S, N, 4, 4, 3)).astype(np.uint8)
    pdm0 = (jnp.zeros((S, N, 6), jnp.float32), jnp.zeros((S, N), bool))
    carry, (outs, _) = rollout(
        jnp.zeros((S,), jnp.float32), jnp.int32(0),
        jnp.arange(S, dtype=jnp.int32), *pdm0,
        jnp.asarray(dets), jnp.asarray(masks), jnp.asarray(crops),
    )
    emb_on = np.asarray(outs)[..., 0] != 0
    assert emb_on.sum(axis=(1, 2)).max() <= 3  # budget respected
    assert not (emb_on & ~masks).any()  # invalid slots never embedded
    assert emb_on[2, 0, 2], "novel det must win the budget on arrival"
    # carry returns (states, (prev_dets, prev_mask)) for streaming use
    _, (pd, pm) = carry
    np.testing.assert_array_equal(np.asarray(pm), masks[-1])


def test_priority_budget_rotation_prevents_starvation():
    """Stable equal-priority dets must ROTATE through the budget (the
    rotation + tie-break terms), not permanently starve whichever
    sorts last."""
    from motcpp_tpu.parallel.streams import make_rollout_general

    S, N, T = 1, 4, 24
    rollout = make_rollout_general(
        lambda st, d, m, e: (st, (e, m)),
        with_embs=True, embed_fn=_stub_embed(), crop_budget=2,
        emb_priority=True, priority_rot=4,
    )
    rng = np.random.default_rng(1)
    dets = np.zeros((T, S, N, 6), np.float32)
    for j in range(N):  # four stable, well-separated objects
        dets[:, 0, j, :4] = [300 * j + 17, 100 + 37 * j,
                             300 * j + 80, 260 + 37 * j]
    dets[..., 4] = 0.9
    masks = np.ones((T, S, N), bool)
    crops = rng.integers(0, 255, (T, S, N, 4, 4, 3)).astype(np.uint8)
    pdm0 = (jnp.zeros((S, N, 6), jnp.float32), jnp.zeros((S, N), bool))
    _, (outs, _) = rollout(
        jnp.zeros((S,), jnp.float32), jnp.int32(0),
        jnp.arange(S, dtype=jnp.int32), *pdm0,
        jnp.asarray(dets), jnp.asarray(masks), jnp.asarray(crops),
    )
    emb_on = np.asarray(outs)[..., 0] != 0
    per_slot = emb_on[:, 0, :].sum(axis=0)
    assert (per_slot > 0).all(), f"starved slots: {per_slot}"


def test_runner_priority_budget_shards_and_matches_uncapped():
    """emb_priority through MultiStreamRunner: with budget >= all valid
    crops the output equals the plain live-ReID path bit-exactly, on one
    device AND sharded over the CPU mesh; the prev-dets carry persists
    across run() calls (T=1 serving ticks keep a novelty baseline)."""
    from motcpp_tpu.models.strongsort import StrongSortConfig, make_strongsort

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh (tests/conftest.py)")
    D = 8
    S, N, T = 8, 4, 3
    init_fn, step_fn = make_strongsort(StrongSortConfig(
        n_init=1, max_tracks=8, max_dets=N, emb_dim=D, gallery_cap=4))
    rng = np.random.default_rng(0)
    dets = np.zeros((T, S, N, 6), np.float32)
    dets[:, :, 0, :4] = [10, 10, 50, 90]
    dets[:, :, 1, :4] = [200, 10, 240, 90]
    dets[..., 4] = 0.9
    masks = np.zeros((T, S, N), bool)
    masks[:, :, :2] = True
    crops = rng.integers(0, 255, (T, S, N, 4, 4, 3)).astype(np.uint8)

    def mk(devs, **kw):
        return MultiStreamRunner(init_fn, step_fn, n_streams=S,
                                 devices=devs, embed_fn=_stub_embed(D), **kw)

    r_plain = mk(jax.devices()[:1])
    r_pri1 = mk(jax.devices()[:1], crop_budget=S * N, emb_priority=True)
    r_pri8 = mk(jax.devices()[:8], crop_budget=S * N, emb_priority=True)
    a = r_plain.run(jnp.asarray(dets), jnp.asarray(masks),
                    embs=jnp.asarray(crops))
    b = r_pri1.run(jnp.asarray(dets), jnp.asarray(masks),
                   embs=jnp.asarray(crops))
    c = r_pri8.run(jnp.asarray(dets), jnp.asarray(masks),
                   embs=jnp.asarray(crops))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(c[0]))
    # streaming: second run must carry prev dets (not reset to novel)
    b2 = r_pri1.run(jnp.asarray(dets), jnp.asarray(masks),
                    embs=jnp.asarray(crops))
    a2 = r_plain.run(jnp.asarray(dets), jnp.asarray(masks),
                     embs=jnp.asarray(crops))
    np.testing.assert_array_equal(np.asarray(a2[0]), np.asarray(b2[0]))
    assert r_pri1._prev_dets is not None
