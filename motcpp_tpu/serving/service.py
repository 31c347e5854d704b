"""TrackingService: a continuous multi-stream serving loop.

Glue between the ingest runtime (:mod:`motcpp_tpu.serving.mux`, native
C++ frame queues) and the jitted tracker core: producers attach stream
slots and submit frames from any thread; each :meth:`TrackingService.step`
assembles one fixed-shape batch, runs ONE vmapped tracker step on
device, and returns the per-stream emissions.

Exact per-stream semantics under irregular arrival (the TPU-native
design point):

* the batched step always executes all S slots (SPMD — no ragged
  control flow), but slots with no queued frame this tick are masked
  back to their previous state, so an absent stream's tracks do not
  age, its frame counter does not advance, and its next frame continues
  bit-exactly where it left off (test: tests/test_serving.py);
* a freshly attached slot is re-initialized by the same masked select,
  so recycled slots start from a clean state (fresh IDs) without
  recompilation or host-side state surgery.

The reference has no serving layer; its concurrency story is one
tracker instance per thread (reference: docs/guides/architecture.md:
246-258). This module is that story's batched equivalent: the threads
only move frames; one chip steps every stream at once.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motcpp_tpu.serving.mux import create_mux


@dataclasses.dataclass(frozen=True)
class StreamHandle:
    """Capability to submit frames for one attached stream."""

    slot: int
    generation: int


@dataclasses.dataclass(frozen=True)
class ServedBatch:
    """Result of one service tick.

    present: (S,) bool — streams that consumed a frame this tick.
    outs: (S, K, 8) float32 — [x1, y1, x2, y2, id, conf, cls, det_ind].
    out_masks: (S, K) bool — valid emission rows (false wherever
        present is false).
    """

    present: np.ndarray
    outs: np.ndarray
    out_masks: np.ndarray

    def tracks_for(self, handle: StreamHandle) -> np.ndarray:
        """(M, 8) emissions for one stream this tick (empty if absent)."""
        m = self.out_masks[handle.slot]
        return self.outs[handle.slot][m]


@dataclasses.dataclass
class PendingBatch:
    """In-flight tick from :meth:`TrackingService.step_async`.

    Holds device futures; ``result()`` blocks on the device fetch and
    returns the :class:`ServedBatch`. Enables double-buffered serving:
    dispatch tick t+1 (host assemble + H2D crop transfer) while tick
    t's XLA program is still running, so the wire transfer — which
    bounds the live-ReID tick on bandwidth-starved links — overlaps
    compute instead of serializing with it (docs/deployment.md
    "Pipelined serving")."""

    present: np.ndarray
    _outs: Any
    _out_masks: Any
    _t0: float
    _svc_ref: Any

    def result(self) -> ServedBatch:
        batch = ServedBatch(
            present=self.present,
            outs=np.asarray(self._outs),
            out_masks=np.asarray(self._out_masks),
        )
        self._svc_ref._record_tick(self._t0, batch)
        return batch


def make_service_step(init_fn: Callable[[], Any], step_fn: Callable,
                      with_embs: bool, with_warps: bool = False,
                      embed_fn: Callable | None = None,
                      crop_budget: int | None = None,
                      emb_cadence: int | None = None,
                      emb_priority: bool = False,
                      priority_rot: int = 8,
                      compact_crops: bool = False):
    """Build the present/reset-gated batched step.

    Returns ``svc(states, dets, masks, present, reset[, embs][, warps])
    -> (states, (outs, out_masks))`` where all inputs carry a leading S
    axis. ``reset`` slots are re-initialized BEFORE the step (fresh
    attach); ``~present`` slots keep their previous state AFTER it
    (absent stream — the step still executes, its writes are discarded).

    With ``embed_fn`` (appearance.reid.make_embed_fn) the embedding
    input is raw uint8 crops (S, N, Hc, Wc, 3) and the ReID CNN runs
    inside the same XLA program as the tracker step, batched over the
    S*N crop set — live ReID at serving scale (the reference computes
    features inside update() per stream on the host,
    onnx_backend.cpp:110-223 via botsort.cpp:281).

    emb_cadence=k (live ReID only): embed each stream's crops only on
    ticks where ``(tick + slot) % k == 0`` — the staggered round-robin
    of parallel.streams.make_rollout_general, here at the serving
    boundary. The svc then takes two extra args after ``reset``:
    ``tick`` (replicated int32 scalar) and ``stream_ids`` ((S,) int32,
    sharded like states). The CNN batch shrinks ~k x per tick while
    track features ride each tracker's EMA/gallery; skipped streams'
    dets associate by motion for that tick (zero embeddings).

    compact_crops (cadence only): the crops input is PRE-COMPACTED to
    the scheduled slots — shape (S//k, n, Hc, Wc, 3), rows ordered by
    slot id — and is scattered back to the full (S, n, ...) layout
    in-graph (the schedule is re-derived from tick + stream_ids, so
    the scatter indices are exact). This cuts the host->device crop
    transfer k x per tick — the dominant wire cost of an images-in
    tick — while producing bit-identical embeddings (non-scheduled
    slots are zero + masked either way). Requires the per-shard slot
    count to divide by k (TrackingService enforces / falls back).
    """

    vstep = jax.vmap(step_fn)
    use_cadence = emb_cadence is not None and int(emb_cadence) > 1
    if use_cadence and embed_fn is None:
        raise ValueError("emb_cadence requires live ReID (embed_fn)")
    if emb_priority:
        if crop_budget is None or embed_fn is None:
            raise ValueError("emb_priority requires live ReID with a "
                             "crop_budget (it chooses WHICH crops fill "
                             "the budget)")
        if use_cadence:
            raise ValueError("emb_priority replaces emb_cadence; set one")
    use_adv = use_cadence or emb_priority
    k_cad = int(emb_cadence) if emb_cadence else 1

    def _sel(mask, a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    def svc(states, dets, masks, present, reset, *extra):
        if use_adv:
            tick, stream_ids, *extra = extra
            extra = tuple(extra)
        prev_dm = None
        if emb_priority:
            prev_dm = (extra[0], extra[1])
            extra = tuple(extra[2:])
        S = dets.shape[0]
        fresh = jax.vmap(lambda _: init_fn())(jnp.arange(S))
        states = jax.tree_util.tree_map(
            lambda f, s: _sel(reset, f, s), fresh, states
        )
        # ingest conditioning: a serving boundary cannot trust its
        # producers — non-finite detection rows are masked off (vs the
        # reference's per-tracker NaN pruning of *states*, sort.cpp:
        # 129-137, which happens a frame too late for a hostile inf
        # confidence to be kept out of the emissions;
        # tests/test_serving_abuse.py)
        masks = masks & present[:, None] & jnp.isfinite(dets).all(-1)
        if with_embs and embed_fn is None and len(extra):
            e = extra[0]
            e = jnp.where(
                jnp.isfinite(e).all(-1, keepdims=True), e, 0.0
            )
            extra = (e,) + extra[1:]
        if with_warps:
            w = extra[-1]
            ident = jnp.broadcast_to(
                jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]], w.dtype), w.shape
            )
            w_ok = jnp.isfinite(w).all((-2, -1))[:, None, None]
            extra = extra[:-1] + (jnp.where(w_ok, w, ident),)
        if with_embs and embed_fn is not None:
            from motcpp_tpu.appearance.reid import embed_valid_crops

            emb_masks, budget = masks, crop_budget
            pri = None
            crops_in = extra[0]
            if emb_priority:
                from motcpp_tpu.parallel.streams import embedding_priority

                pri = embedding_priority(dets, emb_masks, prev_dm[0],
                                         prev_dm[1], tick,
                                         rot=priority_rot)
            if use_cadence:
                gate = ((tick + stream_ids) % k_cad) == 0  # (S,)
                emb_masks = masks & gate[:, None]
                auto = -(-S // k_cad) * dets.shape[1]
                budget = min(budget, auto) if budget is not None else auto
                if compact_crops:
                    # crops_in is (S//k, n, Hc, Wc, 3): only the slots
                    # scheduled this tick crossed the wire. Scatter
                    # them back to the full slot layout (exact S//k
                    # scheduled rows per shard by the divisibility
                    # invariant, so nonzero(size=) never pads).
                    idx = jnp.nonzero(
                        gate, size=S // k_cad, fill_value=0
                    )[0]
                    crops_in = jnp.zeros(
                        (S,) + crops_in.shape[1:], crops_in.dtype
                    ).at[idx].set(crops_in)
            e = embed_valid_crops(embed_fn, crops_in, dets, emb_masks,
                                  budget=budget, priority=pri)
            extra = (e,) + tuple(extra[1:])
        if with_embs and with_warps:
            new_states, (outs, out_masks) = vstep(
                states, dets, masks, extra[0], extra[1]
            )
        elif with_embs:
            new_states, (outs, out_masks) = vstep(
                states, dets, masks, extra[0]
            )
        elif with_warps:
            new_states, (outs, out_masks) = vstep(
                states, dets, masks, None, extra[0]
            )
        else:
            new_states, (outs, out_masks) = vstep(states, dets, masks)
        merged = jax.tree_util.tree_map(
            lambda n, o: _sel(present, n, o), new_states, states
        )
        # emission guard: rows whose box went non-finite (e.g. a
        # zero-area detection NaN-ing the XYAH aspect state — the
        # reference's ByteTrack has no NaN pruning, bytetrack.cpp, and
        # faithfully reproduces this) are masked out of the serving
        # output; the track itself ages out via the normal lifecycle
        out_masks = (
            out_masks & present[:, None] & jnp.isfinite(outs).all(-1)
        )
        return merged, (outs, out_masks)

    return svc


class TrackingService:
    """Continuous tracking over dynamically attached streams.

    Example:
        svc = TrackingService.from_tracker("bytetrack", n_streams=64)
        cam = svc.attach()
        svc.submit(cam, dets)            # any thread
        batch = svc.step()               # driver loop
        rows = batch.tracks_for(cam)

    Args:
        init_fn / step_fn: a tracker core (``make_<tracker>(cfg)``).
        n_streams: S slots; with multiple devices, sharded over a 1-D
            ``Mesh(("streams",))`` (must divide the device count).
        max_dets: N detection slots per frame.
        emb_dim: per-detection embedding width (0 = motion-only).
        queue_depth: per-slot frame queue; overflow drops the oldest.
    """

    def __init__(self, init_fn: Callable[[], Any], step_fn: Callable,
                 n_streams: int, max_dets: int = 32, emb_dim: int = 0,
                 queue_depth: int = 4, devices: list | None = None,
                 prefer_native_mux: bool = True, with_warps: bool = False,
                 crop_hw: tuple | None = None,
                 embed_fn: Callable | None = None,
                 crop_budget: int | None = None,
                 emb_cadence: int | None = None,
                 emb_priority: bool = False,
                 priority_rot: int = 8,
                 cadence_compact: bool | None = None):
        """crop_hw + embed_fn switch the service to LIVE ReID: producers
        submit raw (n, Hc, Wc, 3) uint8 detection crops instead of
        embeddings (the mux carries them natively), and the CNN runs
        in-graph each tick. emb_dim must then be the embed feature
        width (the tracker cfg's emb_dim).

        crop_budget: GLOBAL per-tick cap on crops embedded by the CNN
        (appearance.reid.embed_valid_crops; split evenly over devices,
        must divide). Ticks with more valid detections than the budget
        embed the highest-confidence ones and let the rest associate by
        motion only — bounded tick latency under detection floods.

        emb_cadence=k: embed each stream's crops only every k-th tick
        (staggered per slot; see make_service_step) — divides the
        per-tick CNN cost ~k x, the real-time live-ReID lever
        (docs/deployment.md SLO table).

        emb_priority=True (requires crop_budget): fill the per-tick CNN
        budget by tracking value — novelty vs the previous tick's dets,
        crowding, and a staggered rotation floor (parallel.streams.
        embedding_priority; accuracy cost measured in
        tests/accuracy_budget.json). The previous tick's dets/masks are
        held by the service and fed back each tick. Replaces
        emb_cadence for the cadence-sensitive trackers (StrongSORT /
        HybridSORT deploy priority-0.6; see bench.py DEPLOYED points).

        cadence_compact: ship only the scheduled slots' crops to the
        device each tick (k x fewer H2D bytes, bit-identical output).
        Default None = on automatically whenever the per-device slot
        count divides by k; False forces the full transfer (A/B
        measurement), True raises if the divisibility doesn't hold."""
        self.n_streams = int(n_streams)
        self.max_dets = int(max_dets)
        self.emb_dim = int(emb_dim)
        self.with_warps = bool(with_warps)
        self.crop_hw = tuple(int(x) for x in crop_hw) if crop_hw else None
        self._embed_fn = embed_fn
        if (embed_fn is None) != (self.crop_hw is None):
            raise ValueError("crop_hw and embed_fn go together")
        if embed_fn is not None and self.emb_dim <= 0:
            raise ValueError("live ReID needs emb_dim = feature width")
        self.devices = devices if devices is not None else jax.devices()
        n_dev = len(self.devices)
        if self.n_streams % n_dev != 0:
            raise ValueError(
                f"n_streams={n_streams} must divide evenly over "
                f"{n_dev} devices"
            )
        self.mux = create_mux(
            self.n_streams, self.max_dets,
            # crops replace wire embeddings when live ReID is on
            0 if embed_fn is not None else self.emb_dim,
            queue_depth, prefer_native=prefer_native_mux,
            crop_hw=self.crop_hw,
        )
        self._init_fn = init_fn
        shard_budget = None
        if crop_budget is not None:
            if embed_fn is None:
                raise ValueError("crop_budget requires live ReID "
                                 "(crop_hw + embed_fn)")
            if crop_budget % n_dev != 0:
                raise ValueError(
                    f"crop_budget={crop_budget} must divide evenly over "
                    f"{n_dev} devices"
                )
            shard_budget = int(crop_budget) // n_dev
        self.emb_cadence = int(emb_cadence) if emb_cadence else 1
        self._use_cadence = self.emb_cadence > 1
        if self._use_cadence and embed_fn is None:
            raise ValueError("emb_cadence requires live ReID "
                             "(crop_hw + embed_fn)")
        self.emb_priority = bool(emb_priority)
        if self.emb_priority and (crop_budget is None or embed_fn is None):
            raise ValueError("emb_priority requires live ReID with a "
                             "crop_budget")
        if self.emb_priority and self._use_cadence:
            raise ValueError("emb_priority replaces emb_cadence; set one")
        self._use_adv = self._use_cadence or self.emb_priority
        self._prev_dm = None  # previous tick's (dets, masks) for priority
        # compacted crop transfer: with cadence k, only the ~S/k
        # scheduled slots' crops cross the wire each tick (k x fewer
        # H2D bytes, bit-identical embeddings). Needs the per-shard
        # slot count to divide by k so every tick schedules exactly
        # S//k slots (S//n_dev per shard); otherwise fall back to the
        # full transfer.
        self._cad_compact = (
            self._use_cadence
            and (self.n_streams // n_dev) % self.emb_cadence == 0
        )
        if cadence_compact is not None:
            if cadence_compact and not self._cad_compact:
                raise ValueError(
                    "cadence_compact needs emb_cadence > 1 and the "
                    "per-device slot count to divide by it "
                    f"(n_streams={n_streams}, devices={n_dev}, "
                    f"k={self.emb_cadence})"
                )
            self._cad_compact = bool(cadence_compact)
        svc = make_service_step(
            init_fn, step_fn, with_embs=emb_dim > 0,
            with_warps=self.with_warps, embed_fn=embed_fn,
            crop_budget=shard_budget, emb_cadence=emb_cadence,
            emb_priority=self.emb_priority, priority_rot=priority_rot,
            compact_crops=self._cad_compact,
        )

        if n_dev > 1:
            from jax import shard_map

            self.mesh = Mesh(np.asarray(self.devices), ("streams",))
            sp = P("streams")
            n_in = 4 + int(emb_dim > 0) + int(self.with_warps)
            in_specs = (sp,) * 5
            if self._use_adv:
                # tick replicated, global slot ids sharded like states
                in_specs = in_specs + (P(), sp)
            if self.emb_priority:
                # previous tick's dets + masks sharded like states
                in_specs = in_specs + (sp, sp)
            in_specs = in_specs + (sp,) * (n_in - 4)
            svc = shard_map(
                svc,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(sp, (sp, sp)),
                # slot-local while_loops (LAP) start from replicated
                # constants that become stream-varying; slots never
                # communicate, so skip the varying-manual-axes check
                check_vma=False,
            )
        else:
            self.mesh = None
        self._svc = jax.jit(svc, donate_argnums=(0,))
        self._states = None
        self._lock = threading.Lock()
        self._reset = np.zeros((self.n_streams,), bool)
        self._gen = np.zeros((self.n_streams,), np.int64)
        self._ticks = 0
        self._tick_ms_last = 0.0
        self._tick_ms_ewma = None
        self._tick_ms_max = 0.0
        self._last_present = 0

    @classmethod
    def from_tracker(cls, name: str, n_streams: int, max_dets: int = 32,
                     emb_dim: int = 0, tracker_kw: dict | None = None,
                     **service_kw):
        """Build a service from a tracker name ("bytetrack", "sort", ...).

        tracker_kw goes to the tracker's config dataclass (thresholds,
        max_tracks, lap_impl, ...); capacities are filled from the
        service arguments.
        """
        import importlib

        mod = importlib.import_module(f"motcpp_tpu.models.{name}")
        make = getattr(mod, f"make_{name}")
        cfg_cls = next(
            (v for k, v in vars(mod).items() if k.lower() == f"{name}config"
             or k == {"ucmctrack": "UCMCConfig"}.get(name)),
            None,
        )
        if cfg_cls is None:
            raise ValueError(
                f"tracker module motcpp_tpu.models.{name} has no config "
                f"class matching '{name}Config' (case-insensitive)"
            )
        kw = dict(tracker_kw or {})
        kw.setdefault("max_dets", max_dets)
        if emb_dim > 0 and "emb_dim" in cfg_cls.__dataclass_fields__:
            kw.setdefault("emb_dim", emb_dim)
        cfg = cfg_cls(**kw)
        init_fn, step_fn = make(cfg)
        return cls(init_fn, step_fn, n_streams=n_streams, max_dets=max_dets,
                   emb_dim=emb_dim, **service_kw)

    # ------------------------------------------------------------------
    def attach(self) -> StreamHandle:
        """Claim a slot for a new stream; its state is re-initialized on
        the next step (fresh IDs, empty track table)."""
        slot, gen = self.mux.attach()
        with self._lock:
            self._reset[slot] = True
            self._gen[slot] = gen
        return StreamHandle(slot=slot, generation=gen)

    def detach(self, handle: StreamHandle) -> None:
        self._check(handle)
        self.mux.detach(handle.slot)

    def submit(self, handle: StreamHandle, dets, embs=None,
               warp=None, crops=None) -> int:
        """Queue one frame (thread-safe); returns the queue length.
        warp: optional (2, 3) camera warp for this frame — only applied
        when the service was built with with_warps=True. crops:
        (n, Hc, Wc, 3) uint8 detection crops — the live-ReID input when
        the service was built with crop_hw/embed_fn."""
        self._check(handle)
        return self.mux.submit(handle.slot, dets, embs, warp, crops)

    def pending(self, handle: StreamHandle) -> int:
        self._check(handle)
        return self.mux.pending(handle.slot)

    def _check(self, handle: StreamHandle) -> None:
        if self._gen[handle.slot] != handle.generation:
            raise ValueError(
                f"stale handle: slot {handle.slot} was re-attached "
                f"(generation {handle.generation} != "
                f"{int(self._gen[handle.slot])})"
            )

    # ------------------------------------------------------------------
    def step(self) -> ServedBatch:
        """Assemble one batch and run one tracker step over all slots."""
        return self.step_async().result()

    def step_async(self) -> PendingBatch:
        """Dispatch one tick without waiting for its outputs.

        Assembles the batch, starts the H2D transfer, enqueues the XLA
        program, and returns immediately with a :class:`PendingBatch`;
        call ``.result()`` to fetch. Dispatching tick t+1 before
        resolving tick t double-buffers the service: the next tick's
        crop transfer rides the copy engine while the current tick
        computes, so the steady-state tick interval is
        max(transfer, compute) instead of their sum — the lever that
        makes images-in configs meet the 33 ms tick SLO on hosts where
        the crop wire transfer alone approaches the budget
        (scripts/serving_latency.py --pipeline). States are sequenced
        by dispatch order, so interleaving is safe from one loop
        thread; outputs must be resolved in dispatch order."""
        t0 = time.perf_counter()
        dets, mask, embs, warps, present, crops = self.mux.assemble()
        with self._lock:
            reset = self._reset.copy()
            self._reset[:] = False
        if self._states is None:
            self._states = self._init_states()
        args = [
            jnp.asarray(dets), jnp.asarray(mask),
            jnp.asarray(present), jnp.asarray(reset),
        ]
        cadence_args = []
        if self._use_adv:
            cadence_args = [
                jnp.int32(self._ticks),
                jnp.arange(self.n_streams, dtype=jnp.int32),
            ]
        if self.emb_priority:
            pdm = self._prev_dm
            if pdm is None:
                pdm = (
                    jnp.zeros_like(jnp.asarray(dets)),
                    jnp.zeros_like(jnp.asarray(mask)),
                )
            cadence_args += list(pdm)
        if self._embed_fn is not None:
            if self._cad_compact:
                # ship only the slots scheduled to embed this tick
                # (schedule mirrors make_service_step's gate exactly)
                gate = (
                    (self._ticks + np.arange(self.n_streams))
                    % self.emb_cadence == 0
                )
                crops = crops[gate]
            args.append(jnp.asarray(crops))
        elif self.emb_dim > 0:
            args.append(jnp.asarray(embs))
        if self.with_warps:
            args.append(jnp.asarray(warps))
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("streams"))
            args = [jax.device_put(a, sh) for a in args]
            if cadence_args:
                # slot ids + (priority mode) prev dets/masks all shard
                # like states; the tick scalar stays replicated
                cadence_args[1:] = [
                    jax.device_put(a, sh) for a in cadence_args[1:]
                ]
        # cadence/priority args go between reset and the embs/crops/
        # warps legs
        args = args[:4] + cadence_args + args[4:]
        self._states, (outs, out_masks) = self._svc(self._states, *args)
        if self.emb_priority:
            d_j, m_j = jnp.asarray(dets), jnp.asarray(mask)
            if self.mesh is not None:
                sh = NamedSharding(self.mesh, P("streams"))
                d_j = jax.device_put(d_j, sh)
                m_j = jax.device_put(m_j, sh)
            self._prev_dm = (d_j, m_j)
        self._ticks += 1
        return PendingBatch(
            present=np.asarray(present),
            _outs=outs, _out_masks=out_masks, _t0=t0, _svc_ref=self,
        )

    def _record_tick(self, t0: float, batch: ServedBatch) -> None:
        # observability: wall time of the whole tick (assemble + device
        # step + fetch; for pipelined callers this is the DISPATCH->
        # FETCH latency, which overlapping ticks can stretch past the
        # tick interval) and slot occupancy — stats() exposes these for
        # SLO monitoring (scripts/serving_latency.py measures the full
        # distribution offline)
        ms = (time.perf_counter() - t0) * 1e3
        self._tick_ms_last = ms
        self._tick_ms_max = max(self._tick_ms_max, ms)
        self._tick_ms_ewma = (
            ms if self._tick_ms_ewma is None
            else 0.95 * self._tick_ms_ewma + 0.05 * ms
        )
        self._last_present = int(batch.present.sum())

    def _init_states(self):
        states = jax.vmap(lambda _: self._init_fn())(
            jnp.arange(self.n_streams)
        )
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("streams"))
            states = jax.device_put(states, sh)
        return states

    @property
    def states(self):
        """Carry state pytree (checkpointable with utils.checkpoint).

        Returns a copy: the live carry is donated to the next
        :meth:`step`, so handing out the raw buffers would let a caller
        hold deleted arrays after that step runs.
        """
        if self._states is None:
            return None
        return jax.tree_util.tree_map(jnp.copy, self._states)

    def restore(self, states) -> None:
        """Install a checkpointed carry state (failover / migration).

        The pytree must have the structure of this service's tracker
        state batched over n_streams (i.e. a previous ``svc.states``,
        possibly round-tripped through ``utils.checkpoint``). Stream
        continuation after restore is bit-exact
        (tests/test_serving.py::test_service_checkpoint_failover).
        """
        template = jax.vmap(lambda _: self._init_fn())(
            jnp.arange(self.n_streams)
        )
        t_struct = jax.tree_util.tree_structure(template)
        s_struct = jax.tree_util.tree_structure(states)
        if t_struct != s_struct:
            raise ValueError(
                f"state structure mismatch: expected {t_struct}, "
                f"got {s_struct}"
            )
        # jnp.array (not asarray) so the installed leaves are fresh
        # buffers: _svc donates argument 0, and installing the caller's
        # live arrays (e.g. another service's .states) would let the
        # next step() delete buffers the caller still holds.
        states = jax.tree_util.tree_map(
            lambda t, s: jnp.array(s, t.dtype), template, states
        )
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("streams"))
            states = jax.device_put(states, sh)
        self._states = states

    def export_stream(self, handle: StreamHandle):
        """Snapshot ONE stream's tracker state (host numpy pytree).

        The unit of cross-host rebalancing: a camera moves between
        services by export → import, while every other slot keeps
        running (whole-service :attr:`states`/:meth:`restore` would
        migrate everything at once). Continuation after import is
        bit-exact (tests/test_serving.py::test_stream_migration).
        """
        self._check(handle)
        if self._states is None:
            self._states = self._init_states()
        slot = handle.slot
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a[slot]), self._states
        )

    def import_stream(self, handle: StreamHandle, snapshot) -> None:
        """Install an :meth:`export_stream` snapshot into this slot.

        The target slot should be freshly attached (or its previous
        stream's history is overwritten). Clears the slot's
        attach-time reset flag so the next step CONTINUES the imported
        stream instead of re-initializing it. Structure/shape-checked
        against a single-slot template; raises ValueError on mismatch.
        """
        self._check(handle)
        template = self._init_fn()
        t_struct = jax.tree_util.tree_structure(template)
        s_struct = jax.tree_util.tree_structure(snapshot)
        if t_struct != s_struct:
            raise ValueError(
                f"stream snapshot structure mismatch: expected "
                f"{t_struct}, got {s_struct}"
            )
        for t, s in zip(jax.tree_util.tree_leaves(template),
                        jax.tree_util.tree_leaves(snapshot)):
            if tuple(np.shape(t)) != tuple(np.shape(s)):
                raise ValueError(
                    f"stream snapshot shape mismatch: expected "
                    f"{tuple(np.shape(t))}, got {tuple(np.shape(s))}"
                )
        if self._states is None:
            self._states = self._init_states()
        slot = handle.slot
        self._states = jax.tree_util.tree_map(
            lambda full, s: full.at[slot].set(
                jnp.asarray(s, full.dtype)
            ),
            self._states, snapshot,
        )
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("streams"))
            self._states = jax.device_put(self._states, sh)
        with self._lock:
            self._reset[slot] = False

    def stats(self) -> dict:
        """Mux counters + tick-latency/occupancy gauges.

        submitted/dropped/assembled/attached come from the mux;
        tick_ms_{last,ewma,max} time the full tick (assemble + device
        step + fetch; ewma α=0.05), and occupancy is the live-slot
        fraction of the latest tick. All values are snapshots — cheap
        enough to poll every tick for an external metrics scraper.
        """
        s = self.mux.stats()
        s["ticks"] = self._ticks
        s["tick_ms_last"] = round(self._tick_ms_last, 3)
        s["tick_ms_ewma"] = (
            round(self._tick_ms_ewma, 3)
            if self._tick_ms_ewma is not None else 0.0
        )
        s["tick_ms_max"] = round(self._tick_ms_max, 3)
        s["occupancy"] = (
            self._last_present / self.n_streams if self.n_streams else 0.0
        )
        return s
