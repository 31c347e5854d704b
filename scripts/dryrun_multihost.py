#!/usr/bin/env python3
"""Two-process (multi-host / DCN) stream-parallel dryrun.

SURVEY §2.8 maps the reference's "one tracker per thread" scaling to a
sharded stream axis; the single-process dryrun (__graft_entry__.
dryrun_multichip) proves the ICI story on one host. This script proves
the ingest story ACROSS process boundaries: it spawns N worker
processes on localhost, initializes `jax.distributed` over a TCP
coordinator (the same mechanism a TPU pod slice uses over DCN), builds
one global Mesh spanning every process's CPU devices, and runs one
sharded multi-stream tracking step where each process feeds only its
local shard of streams — detections never leave their ingest host.

The step must produce (on every process) the same per-stream emission
counts as a single-process run of the identical scene, proving that
stream-parallel execution is invariant to how streams are distributed
over hosts.

Usage:
    python scripts/dryrun_multihost.py              # parent: spawn 2 workers
    python scripts/dryrun_multihost.py --procs 2    # explicit
(Each worker re-execs this file with --worker <i>.)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEVICES_PER_PROC = 4
STREAMS_PER_DEVICE = 2
T, N, K = 3, 4, 8


def _scene(S):
    """Deterministic global scene — every process builds the same arrays
    and slices out its own shard (stand-in for per-host ingest)."""
    import numpy as np

    rng = np.random.default_rng(0)
    dets = rng.uniform(0, 100, (T, S, N, 6)).astype(np.float32)
    dets[..., 2:4] += 120.0
    dets[..., 4] = 0.9
    dets[..., 5] = 0.0
    masks = np.ones((T, S, N), bool)
    return dets, masks


def _single_process_reference(S):
    """Per-stream emission counts from an ordinary single-process run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack
    from motcpp_tpu.parallel import MultiStreamRunner

    init_fn, step_fn = make_bytetrack(
        ByteTrackConfig(max_tracks=K, max_dets=N)
    )
    runner = MultiStreamRunner(init_fn, step_fn, n_streams=S,
                               devices=jax.devices()[:1])
    dets, masks = _scene(S)
    outs, out_masks = runner.run(jnp.asarray(dets), jnp.asarray(masks))
    jax.block_until_ready(out_masks)
    return np.asarray(out_masks).sum(axis=(0, 2))


def worker(proc_id: int, n_procs: int, port: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from motcpp_tpu.models.bytetrack import ByteTrackConfig, make_bytetrack
    from motcpp_tpu.parallel.streams import make_rollout

    n_dev = jax.device_count()  # global
    assert n_dev == n_procs * DEVICES_PER_PROC, (n_dev, n_procs)
    S = n_dev * STREAMS_PER_DEVICE
    mesh = Mesh(np.asarray(jax.devices()), ("streams",))

    init_fn, step_fn = make_bytetrack(
        ByteTrackConfig(max_tracks=K, max_dets=N)
    )
    rollout = jax.jit(
        jax.shard_map(
            make_rollout(step_fn),
            mesh=mesh,
            in_specs=(P("streams"), P(None, "streams"), P(None, "streams")),
            out_specs=(P("streams"), (P(None, "streams"),
                                      P(None, "streams"))),
            check_vma=False,
        )
    )

    dets, masks = _scene(S)

    def _global(host_arr, spec):
        """Assemble a global array from per-process local shards — the
        DCN ingest contract: each process only materializes ITS streams."""
        sharding = NamedSharding(mesh, spec)

        def cb(index):
            return host_arr[index]  # slice of the deterministic scene

        return jax.make_array_from_callback(host_arr.shape, sharding, cb)

    g_states = jax.vmap(lambda _: init_fn())(jnp.arange(S))
    # states start replicated-identical; shard them over the mesh
    g_states = jax.tree_util.tree_map(
        lambda a: _global(np.asarray(a), P("streams", *([None] * (a.ndim - 1)))),
        g_states,
    )
    g_dets = _global(dets, P(None, "streams", None, None))
    g_masks = _global(masks, P(None, "streams", None))

    _, (outs, out_masks) = rollout(g_states, g_dets, g_masks)
    jax.block_until_ready(out_masks)

    # gather per-stream emissions on every process (allgather via
    # fully-replicated output of a jitted psum-style reduction)
    from jax.experimental import multihost_utils

    local = multihost_utils.process_allgather(out_masks, tiled=True)
    got = np.asarray(local).sum(axis=(0, 2))

    want = _single_process_reference(S)
    np.testing.assert_array_equal(got, want)
    if proc_id == 0:
        print(
            f"dryrun_multihost OK: {n_procs} processes x "
            f"{DEVICES_PER_PROC} devices, S={S} streams, "
            f"{int(got.sum())} emissions, per-stream counts bit-exact "
            f"vs single-process",
            flush=True,
        )
    jax.distributed.shutdown()
    return 0


def parent(n_procs: int, port: int, timeout: int = 600) -> int:
    procs = []
    for i in range(n_procs):
        env = dict(os.environ)
        # each worker is its own jax universe; drop any inherited pinning
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(i),
                 "--procs", str(n_procs), "--port", str(port)],
                env=env,
            )
        )
    rc = 0
    try:
        for p in procs:
            p.wait(timeout=timeout)
            rc |= p.returncode
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        print("dryrun_multihost TIMEOUT", file=sys.stderr)
        return 1
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=12723)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args(argv)
    if args.worker is not None:
        return worker(args.worker, args.procs, args.port)
    return parent(args.procs, args.port)


if __name__ == "__main__":
    sys.exit(main())
