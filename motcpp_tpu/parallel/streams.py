"""Multi-stream tracking: vmap over streams, scan over frames, shard
over chips.

This is the TPU replacement for the reference's "run one tracker
instance per thread" scaling advice (reference:
docs/guides/architecture.md:246-258): S streams * K track slots become
one struct-of-arrays state pytree with a leading stream axis; the
per-frame step is vmapped and the whole video is one ``lax.scan``, so a
chip executes every stream's Kalman algebra, cost matrices and
assignment solves as fused batched kernels. Across chips, the stream
axis is sharded with ``shard_map`` — each device runs its local shard
with zero inter-chip communication in the loop.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_rollout(step_fn: Callable):
    """Build ``rollout(states, dets, masks) -> (states, (outs, out_masks))``.

    step_fn: per-stream pure step ``(state, dets (N, D), mask (N,)) ->
    (state, (out, out_mask))``. The rollout vmaps it over a leading
    stream axis and scans over a leading time axis:

        states: pytree with leading (S, ...)
        dets: (T, S, N, D), masks: (T, S, N)
        -> outs: (T, S, K, 8), out_masks: (T, S, K)
    """

    vstep = jax.vmap(step_fn)

    def rollout(states, dets, masks):
        def body(st, inp):
            d, m = inp
            st, out = vstep(st, d, m)
            return st, out

        return lax.scan(body, states, (dets, masks))

    return rollout


def make_rollout_embs(step_fn: Callable):
    """Like make_rollout for ReID trackers: step_fn additionally takes
    per-detection embeddings, scanned as (T, S, N, D)."""

    vstep = jax.vmap(step_fn)

    def rollout(states, dets, masks, embs):
        def body(st, inp):
            d, m, e = inp
            st, out = vstep(st, d, m, e)
            return st, out

        return lax.scan(body, states, (dets, masks, embs))

    return rollout


def embedding_priority(d, m, pd, pm, t, rot: int = 8):
    """Embedding priority per det slot (S, N): which crops deserve the
    CNN budget this frame.

        2 * novelty + crowding + rotation (+ tie-break jitter)

    novelty  = 1 - max IoU vs the PREVIOUS frame's valid dets of the
               same stream — reappearances/births need fresh appearance
               immediately (their gallery/EMA is empty or stale);
    crowding = max IoU vs the frame's OTHER valid dets — ambiguous
               overlaps are where appearance breaks motion ties;
    rotation = 1 for dets whose spatial cell hashes onto this frame's
               refresh slot ((cell + t) % rot == 0) — a staggered
               freshness floor so stable isolated tracks still re-embed
               every ~rot frames;
    tie      = tiny frame-varying deterministic jitter so equal-priority
               stable dets rotate through the budget instead of starving
               whichever sorts last.

    d (S, N, >=5) dets, m (S, N) valid, pd/pm the previous frame's.
    Public so the ablation accuracy harness (scripts/ablation_benchmark
    --emb-budget) scores EXACTLY the policy the serving rollout runs.
    Measured on the 600-frame ablation scene (StrongSORT, the most
    budget-sensitive tracker): a 60% budget under this priority costs
    ~0.6 HOTA vs 12.3 for plain confidence order at 50% and 3.2 for
    modulo cadence k=2 (tests/accuracy_budget.json).
    """
    from motcpp_tpu.ops.iou import iou_batch

    iou_prev = jax.vmap(iou_batch)(d[..., :4], pd[..., :4])  # (S, N, N)
    iou_prev = jnp.where(pm[:, None, :], iou_prev, 0.0)
    novelty = 1.0 - jnp.max(iou_prev, axis=-1)
    novelty = jnp.where(jnp.any(pm, axis=-1)[:, None], novelty, 1.0)
    iou_self = jax.vmap(iou_batch)(d[..., :4], d[..., :4])
    N = d.shape[1]
    eye = jnp.eye(N, dtype=bool)
    iou_self = jnp.where(m[:, None, :] & ~eye, iou_self, 0.0)
    crowd = jnp.max(iou_self, axis=-1)
    cell = (
        jnp.round(d[..., 0] / 40.0) + jnp.round(d[..., 1] / 40.0)
    ).astype(jnp.int32)
    rotation = ((cell + t) % rot == 0).astype(jnp.float32)
    tie = ((cell * 92837111 + t * 40499) % 1021).astype(
        jnp.float32
    ) * (0.01 / 1021.0)
    return 2.0 * novelty + crowd + rotation + tie


def make_rollout_general(step_fn: Callable, with_embs: bool = False,
                         with_warps: bool = False,
                         embed_fn: Callable | None = None,
                         crop_budget: int | None = None,
                         emb_cadence: int | None = None,
                         emb_priority: bool = False,
                         priority_rot: int = 8,
                         cmc_fn: Callable | None = None,
                         cmc_scale: float = 1.0):
    """Rollout with optional embedding (T, S, N, D), camera-warp
    (T, S, 2, 3), and raw-crop legs. Warps reach the per-stream step as
    its ``warp`` argument, exercising each tracker's CMC application
    style (BoT-SORT corner warp, XYSR affine blocks, camera_update)
    inside the scanned SPMD program — the reference applies warps per
    frame on the host (e.g. botsort.cpp:318-323).

    With ``embed_fn`` (from appearance.reid.make_embed_fn) the
    embedding leg becomes LIVE ReID from pixels: the rollout consumes
    raw uint8 crops (T, S, N, Hc, Wc, 3) instead of embeddings, and
    each scan step runs the CNN over the flattened S*N crop batch
    before the tracker step — one fused XLA program per frame, the
    in-graph equivalent of the reference computing features inside
    update() (onnx_backend.cpp:110-223 via botsort.cpp:281).

    crop_budget caps the CNN batch per frame: only the (up to)
    crop_budget highest-confidence VALID crops are embedded via a
    static-shape compaction gather/scatter (appearance.reid.
    embed_valid_crops) — the reference embeds only the frame's actual
    detections (onnx_backend.cpp:110-133), never its padding.

    emb_cadence=k (live ReID only) amortizes the CNN over frames:
    stream s embeds its detections only on frames where
    ``(frame_idx + s) % k == 0`` (staggered round-robin, so every frame
    embeds exactly S/k streams). Between refreshes a det carries a zero
    embedding — every tracker treats zero-norm det features as
    "no appearance info" and associates by motion/IoU for that frame
    while its per-track EMA/gallery features persist (the reference has
    no such mode: onnx_backend.cpp:110-133 embeds every frame's dets;
    this is the TPU throughput lever VERDICT r3 #1c). The rollout then
    takes a ``frame0`` scalar (first arg after states) so the phase
    persists across calls (serving ticks are T=1). The CNN batch
    auto-shrinks to ceil(S*N/k) unless crop_budget caps it lower.

    With ``cmc_fn`` (a batched estimator like motion.cmc.ecc_jax_batch
    or sof_jax_batch: (S, h, w) prev/cur grayscale -> ((S, 2, 3)
    warps, (S,) ok)) the warp leg becomes LIVE CMC from pixels: the
    rollout consumes per-frame grayscale frames (T, S, h, w) in place
    of warps, the scan carries each stream's previous frame, and every
    step estimates all S warps in-graph before the tracker step — the
    TPU equivalent of the reference estimating ECC/SOF per frame on
    the host inside update() (ecc.cpp:22-98, sof.cpp:24-180).
    ``cmc_scale``: the downscale factor the frames were preprocessed
    with (the reference uses 0.15x, cmc.cpp:8-26); estimated
    translations are rescaled by 1/cmc_scale like ecc.cpp:70-80. The
    rollout then takes ``(prev_frames (S, h, w), has_prev scalar
    bool)`` right after states (after the cadence args if both legs
    are on) and returns ``((states, prev_frames, has_prev), outs)`` so
    the carry persists across calls; the first-ever frame gets the
    identity warp, matching every host estimator's first-frame
    contract."""

    vstep = jax.vmap(step_fn)
    use_cmc = cmc_fn is not None
    if use_cmc and with_warps:
        raise ValueError("cmc_fn replaces the warps input; do not set both")
    if crop_budget is not None and embed_fn is None:
        raise ValueError("crop_budget requires embed_fn (live ReID)")
    if emb_cadence is not None:
        if embed_fn is None:
            raise ValueError("emb_cadence requires embed_fn (live ReID)")
        if int(emb_cadence) < 1:
            raise ValueError(f"emb_cadence must be >= 1, got {emb_cadence}")
    use_cadence = emb_cadence is not None and int(emb_cadence) > 1
    if emb_priority:
        if crop_budget is None:
            raise ValueError(
                "emb_priority needs crop_budget (it chooses WHICH crops "
                "fill the budget)"
            )
        if use_cadence:
            raise ValueError(
                "emb_priority replaces emb_cadence (its rotation term "
                "subsumes the cadence refresh); set one or the other"
            )
    k_cad = int(emb_cadence) if emb_cadence is not None else 1

    def _embed(e, d, m, t, stream_ids=None, prev=None):
        from motcpp_tpu.appearance.reid import embed_valid_crops

        budget = crop_budget
        pri = None
        if emb_priority:
            pd, pm = prev
            pri = embedding_priority(d, m, pd, pm, t, rot=priority_rot)
        elif use_cadence:
            S, N = m.shape
            gate = ((t + stream_ids) % k_cad) == 0  # (S,)
            m = m & gate[:, None]
            auto = -(-S // k_cad) * N  # at most ceil(S/k) streams gated
            budget = min(budget, auto) if budget is not None else auto
        return embed_valid_crops(embed_fn, e, d, m, budget=budget,
                                 priority=pri)

    def _live_warp(pv, hp, f):
        """Estimate (S, 2, 3) warps from the carried previous frames;
        identity until a previous frame exists (first-frame contract of
        every host estimator, e.g. ecc.cpp:40-46)."""
        w, _ok = cmc_fn(pv, f)
        if cmc_scale != 1.0:
            # rescale translation to full-frame pixels (ecc.cpp:70-80)
            w = w.at[..., :, 2].mul(1.0 / float(cmc_scale))
        ident = (
            jnp.zeros_like(w).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
        )
        return jnp.where(hp, w, ident)

    def rollout_cadence(states, frame0, stream_ids, *args):
        # stream_ids (S,) are GLOBAL indices (sharded alongside states)
        # so the gate — and therefore every emission — is bit-identical
        # between single-device and sharded execution. The priority
        # mode shares this rollout: it additionally takes the previous
        # frame's (dets (S, N, C), mask (S, N)) right after stream_ids
        # (zero mask = no previous observations, everything novel) and
        # returns them in the carry so serving ticks (T=1 per call)
        # keep a continuous novelty baseline.
        if emb_priority:
            pdm = (args[0], args[1])
            args = args[2:]
        else:
            pdm = None
        if use_cmc:
            prev0, has_prev0 = args[0], args[1]
            dets, masks, *extra = args[2:]
        else:
            dets, masks, *extra = args

        def body(carry, inp):
            if use_cmc:
                st, t, pdm, pv, hp = carry
            else:
                st, t, pdm = carry
            d, m, e, *rest = inp
            e = _embed(e, d, m, t, stream_ids, prev=pdm)
            pdm2 = (d, m) if emb_priority else pdm
            if use_cmc:
                f = rest[0]
                st, out = vstep(st, d, m, e, _live_warp(pv, hp, f))
                return (st, t + 1, pdm2, f, jnp.bool_(True)), out
            if with_warps:
                st, out = vstep(st, d, m, e, rest[0])
            else:
                st, out = vstep(st, d, m, e)
            return (st, t + 1, pdm2), out

        carry0 = (states, jnp.asarray(frame0, jnp.int32), pdm)
        if use_cmc:
            carry0 = carry0 + (prev0, jnp.asarray(has_prev0, bool))
        carry, outs = lax.scan(body, carry0, (dets, masks) + tuple(extra))
        tail = (carry[2],) if emb_priority else ()
        if use_cmc:
            return (carry[0],) + tail + (carry[3], carry[4]), outs
        if emb_priority:
            return (carry[0],) + tail, outs
        return carry[0], outs

    def rollout(states, *args):
        if use_cmc:
            prev0, has_prev0 = args[0], args[1]
            dets, masks, *extra = args[2:]
        else:
            dets, masks, *extra = args

        def body(carry, inp):
            if use_cmc:
                st, pv, hp = carry
            else:
                st = carry
            d, m, *rest = inp
            e = None
            if with_embs:
                e = rest[0]
                rest = rest[1:]
                if embed_fn is not None:
                    e = _embed(e, d, m, 0)
            if use_cmc:
                f = rest[0]
                w = _live_warp(pv, hp, f)
            elif with_warps:
                w = rest[0]
            else:
                w = None
            if w is not None:
                st, out = vstep(st, d, m, e, w)
            elif with_embs:
                st, out = vstep(st, d, m, e)
            else:
                st, out = vstep(st, d, m)
            if use_cmc:
                return (st, f, jnp.bool_(True)), out
            return st, out

        carry0 = states
        if use_cmc:
            carry0 = (states, prev0, jnp.asarray(has_prev0, bool))
        return lax.scan(body, carry0, (dets, masks) + tuple(extra))

    return rollout_cadence if (use_cadence or emb_priority) else rollout


class MultiStreamRunner:
    """Sharded multi-stream executor.

    Example:
        cfg = SortConfig(max_tracks=128, max_dets=64)
        init_fn, step_fn = make_sort(cfg)
        runner = MultiStreamRunner(init_fn, step_fn, n_streams=256)
        outs, out_masks = runner.run(dets, masks)   # (T,S,N,6), (T,S,N)

    With more than one device, the stream axis is sharded over a 1-D
    ``Mesh(("streams",))`` via shard_map; single-device it is a plain
    jit. Streams must be a multiple of the device count.
    """

    def __init__(
        self,
        init_fn: Callable[[], Any],
        step_fn: Callable,
        n_streams: int,
        devices: list | None = None,
        with_embs: bool = False,
        with_warps: bool = False,
        embed_fn: Callable | None = None,
        crop_budget: int | None = None,
        emb_cadence: int | None = None,
        emb_priority: bool = False,
        priority_rot: int = 8,
        cmc_fn: Callable | None = None,
        cmc_scale: float = 1.0,
    ):
        """embed_fn (appearance.reid.make_embed_fn): switch the
        embedding leg to live ReID — run() then takes raw uint8 crops
        (T, S, N, Hc, Wc, 3) in place of embs and the CNN runs in-graph
        per scanned frame. Implies with_embs.

        crop_budget: GLOBAL per-frame cap on crops embedded by the CNN
        (appearance.reid.embed_valid_crops). Split evenly across
        devices (must divide); each shard embeds its crop_budget/n_dev
        highest-confidence valid crops. With budget >= the number of
        valid detections, emissions are identical to the uncapped path;
        overflow detections fall back to motion-only association for
        that frame.

        emb_cadence=k: embed each stream's crops only every k-th frame
        (staggered per stream; see make_rollout_general) — the CNN cost
        drops ~k x while track features ride each tracker's EMA/gallery.
        The frame phase is carried on the runner across run() calls and
        reset by reset(); k=1 is bit-identical to no cadence.

        emb_priority=True (requires crop_budget): choose WHICH crops
        fill the per-frame CNN budget by tracking value instead of raw
        confidence — 2*novelty (low IoU vs the previous frame's dets:
        births/reappearances) + crowding (high IoU vs this frame's
        other dets: ambiguous overlaps) + a staggered rotation floor
        (every det re-embeds at least every priority_rot frames).
        The previous-frame dets ride the runner carry across run()
        calls (reset by reset()), so T=1 serving ticks keep a
        continuous novelty baseline. Measured accuracy cost for
        StrongSORT at a 60% budget: 0.63 HOTA (vs 3.2 for cadence k=2
        at a 50% CNN load; tests/accuracy_budget.json).

        cmc_fn (motion.cmc.ecc_jax_batch / sof_jax_batch): switch the
        warp leg to LIVE CMC — run() then takes grayscale frames
        (T, S, h, w) float32 at CMC scale (``cmc_scale``; the reference
        preprocesses at 0.15x, cmc.cpp:8-26) via the ``frames=``
        argument, and every scan step estimates all S warps on-device
        before the tracker step. Each stream's previous frame is
        carried on the runner across run() calls (reset by reset());
        the first-ever frame gets the identity warp. Implies the step
        consumes a warp (with_warps-style step signature)."""
        self.n_streams = int(n_streams)
        self.devices = devices if devices is not None else jax.devices()
        self.with_embs = bool(with_embs) or embed_fn is not None
        self.with_warps = bool(with_warps)
        self.with_cmc = cmc_fn is not None
        if self.with_cmc and self.with_warps:
            raise ValueError(
                "cmc_fn computes warps in-graph; do not also set with_warps"
            )
        n_dev = len(self.devices)
        if self.n_streams % n_dev != 0:
            raise ValueError(
                f"n_streams={n_streams} must divide evenly over "
                f"{n_dev} devices"
            )
        self.mesh = Mesh(np.asarray(self.devices), ("streams",))
        self._init_fn = init_fn
        shard_budget = None
        if crop_budget is not None:
            if embed_fn is None:
                raise ValueError("crop_budget requires embed_fn")
            if crop_budget % n_dev != 0:
                raise ValueError(
                    f"crop_budget={crop_budget} must divide evenly over "
                    f"{n_dev} devices"
                )
            shard_budget = int(crop_budget) // n_dev
        self.emb_cadence = int(emb_cadence) if emb_cadence else 1
        self._use_cadence = self.emb_cadence > 1
        if self._use_cadence and embed_fn is None:
            raise ValueError("emb_cadence requires embed_fn (live ReID)")
        self.emb_priority = bool(emb_priority)
        # cadence and priority share the rollout calling convention
        # (frame0 + stream_ids [+ prev dets] before the time-major args)
        self._use_adv = self._use_cadence or self.emb_priority
        self._frame0 = 0
        self._prev_frames = None  # live-CMC carry across run() calls
        self._prev_dets = None  # priority-mode carry across run() calls
        rollout = make_rollout_general(
            step_fn, with_embs=self.with_embs, with_warps=self.with_warps,
            embed_fn=embed_fn, crop_budget=shard_budget,
            emb_cadence=emb_cadence, emb_priority=self.emb_priority,
            priority_rot=priority_rot, cmc_fn=cmc_fn, cmc_scale=cmc_scale,
        )

        if n_dev > 1:
            from jax import shard_map

            spec_state = P("streams")
            spec_t = P(None, "streams")
            n_in = 2 + int(self.with_embs) + int(self.with_warps) \
                + int(self.with_cmc)
            in_specs = (spec_state,)
            if self._use_adv:
                # frame0 replicated, global stream_ids sharded like states
                in_specs = in_specs + (P(), P("streams"))
            if self.emb_priority:
                # previous-frame dets + mask sharded like states
                in_specs = in_specs + (P("streams"), P("streams"))
            if self.with_cmc:
                # prev frames sharded like states, has_prev replicated
                in_specs = in_specs + (P("streams"), P())
            in_specs = in_specs + (spec_t,) * n_in
            out_state = spec_state
            tail = ()
            if self.emb_priority:
                tail = ((P("streams"), P("streams")),)
            if self.with_cmc:
                out_state = (spec_state,) + tail + (P("streams"), P())
            elif self.emb_priority:
                out_state = (spec_state,) + tail
            rollout = shard_map(
                rollout,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(out_state, (spec_t, spec_t)),
                # the LAP while_loop carries start as replicated constants
                # and become stream-varying inside the loop; skip the
                # varying-manual-axes check (streams never communicate)
                check_vma=False,
            )
        # donate the carried states: the previous step's state buffers are
        # dead after each run() (we always keep the returned pytree), so
        # XLA can reuse them in place instead of copying ~K*S-sized arrays
        self._rollout = jax.jit(rollout, donate_argnums=(0,))
        self._states = None

    # ------------------------------------------------------------------
    def init_states(self):
        S = self.n_streams
        states = jax.vmap(lambda _: self._init_fn())(jnp.arange(S))
        if len(self.devices) > 1:
            sharding = NamedSharding(self.mesh, P("streams"))
            states = jax.device_put(states, sharding)
        return states

    def run(self, dets, masks, embs=None, warps=None, states=None,
            frames=None, frame0=None):
        """Track T frames across all streams; returns (outs, out_masks)
        and retains carry state for subsequent calls (streaming use).
        embs (T, S, N, D) required iff constructed with_embs=True;
        warps (T, S, 2, 3) required iff with_warps=True;
        frames (T, S, h, w) float32 CMC-scale grayscale required iff
        constructed with cmc_fn (live in-graph warp estimation).

        Stateless use: passing ``states=`` explicitly makes the call
        pure — the runner's internal cadence phase is neither used nor
        advanced (pass ``frame0=`` to position the embedding cadence;
        default 0), so repeated stateless calls are reproducible
        (ADVICE r4)."""
        if (embs is not None) != self.with_embs:
            raise ValueError(
                "pass embs iff the runner was built with with_embs=True"
            )
        if (warps is not None) != self.with_warps:
            raise ValueError(
                "pass warps iff the runner was built with with_warps=True"
            )
        if (frames is not None) != self.with_cmc:
            raise ValueError(
                "pass frames iff the runner was built with cmc_fn"
            )
        stateless = states is not None
        if states is None:
            states = self._states if self._states is not None else self.init_states()
        else:
            # the rollout donates its state argument (donate_argnums=(0,));
            # copy caller-supplied pytrees so e.g. a checkpoint-restored
            # state the caller retains for retry/branching stays valid
            states = jax.tree_util.tree_map(jnp.copy, states)
        args = (dets, masks)
        if embs is not None:
            args = args + (embs,)
        if frames is not None:
            args = args + (frames,)
        if warps is not None:
            args = args + (warps,)
        if len(self.devices) > 1:
            sharding = NamedSharding(self.mesh, P(None, "streams"))
            args = tuple(
                jax.device_put(jnp.asarray(a), sharding) for a in args
            )
        if self.with_cmc:
            prev = self._prev_frames
            has_prev = prev is not None
            if prev is None:
                # placeholder; the rollout substitutes identity warps
                # until has_prev flips on
                prev = jnp.zeros(np.shape(frames)[1:], jnp.float32)
            if len(self.devices) > 1:
                prev = jax.device_put(
                    jnp.asarray(prev),
                    NamedSharding(self.mesh, P("streams")),
                )
            args = (prev, jnp.bool_(has_prev)) + args
        if self._use_adv:
            ids = jnp.arange(self.n_streams, dtype=jnp.int32)
            if len(self.devices) > 1:
                ids = jax.device_put(
                    ids, NamedSharding(self.mesh, P("streams"))
                )
            if stateless:
                # pure call: cadence phase comes from the caller (or 0),
                # the runner-held phase is untouched
                f0 = int(frame0 or 0)
            else:
                f0 = self._frame0
                self._frame0 += int(np.shape(dets)[0])  # advance by T
            pri_args = ()
            if self.emb_priority:
                pdm = None if stateless else self._prev_dets
                if pdm is None:
                    # no previous observations: everything is novel
                    pdm = (
                        jnp.zeros(np.shape(dets)[1:], jnp.float32),
                        jnp.zeros(np.shape(masks)[1:], bool),
                    )
                if len(self.devices) > 1:
                    sh = NamedSharding(self.mesh, P("streams"))
                    pdm = tuple(jax.device_put(a, sh) for a in pdm)
                pri_args = pdm
            args = (jnp.int32(f0), ids) + tuple(pri_args) + args
        elif frame0 is not None:
            raise ValueError("frame0 only applies with emb_cadence set")
        carry, outs = self._rollout(states, *args)
        if stateless:
            # don't clobber the streaming carry with the pure call's
            return outs
        if self.emb_priority:
            if self.with_cmc:
                self._states, self._prev_dets, self._prev_frames, _ = carry
            else:
                self._states, self._prev_dets = carry
        elif self.with_cmc:
            self._states, self._prev_frames, _ = carry
        else:
            self._states = carry
        return outs

    def set_states(self, states, frame0: int = 0):
        """Install a (e.g. checkpoint-restored) carry as the streaming
        state and position the embedding-cadence phase. Subsequent
        run() calls continue from it — the resume counterpart of the
        pure ``run(states=...)`` call."""
        self._states = jax.tree_util.tree_map(jnp.copy, states)
        if len(self.devices) > 1:
            self._states = jax.device_put(
                self._states, NamedSharding(self.mesh, P("streams"))
            )
        self._frame0 = int(frame0)

    @property
    def states(self):
        """Current carry state pytree (for checkpointing), or None if
        no rollout has run yet. Returns a copy: the rollout donates its
        state argument, so the live carry buffers are deleted by the
        next run() — a snapshot must own its memory to stay valid."""
        if self._states is None:
            return None
        return jax.tree_util.tree_map(jnp.copy, self._states)

    def reset(self):
        self._states = None
        self._frame0 = 0
        self._prev_frames = None
        self._prev_dets = None
