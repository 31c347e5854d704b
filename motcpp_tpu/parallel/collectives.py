"""Cross-chip metrics aggregation over the stream mesh.

The tracking hot loop is collective-free (streams are independent —
SURVEY.md §2.8), so ICI traffic appears only when aggregating results:
fleet-level observability counters (tracks emitted, active streams,
frames processed) that every host wants globally consistent without
funnelling the full (T, S, K) output tensors through host memory.

Two standard patterns over the 1-D ``Mesh(("streams",))``:

  * :func:`emission_stats` — ``psum``: each device reduces its local
    stream shard, one scalar-sized collective rides ICI, every device
    holds the global totals.
  * :func:`per_stream_emissions` — ``all_gather``: per-stream counts
    reduced locally over (T, K) then gathered so every device sees the
    full (S,) vector (e.g. for a load balancer deciding stream
    placement).

Both run under ``shard_map`` and are validated on the 8-device CPU mesh
(tests/test_parallel.py) against the unsharded reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def emission_stats(out_masks, mesh: Mesh):
    """Global emission totals via an on-mesh psum.

    out_masks: (T, S, K) bool — the rollout's emission mask, stream axis
    sharded over ``mesh`` (unsharded input works too; shard_map splits it).
    Returns a dict of scalars, identical on every device:
      total_emissions, frames_processed (T * S), active_streams (streams
      that emitted at least once), peak_tracks (max concurrent emissions
      of any (frame, stream) on the whole mesh — a max collective).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(None, "streams"),
        out_specs=P(),
    )
    def reduce(masks):
        m = masks.astype(jnp.int32)
        local_total = jnp.sum(m)
        local_active = jnp.sum(jnp.any(masks, axis=(0, 2)).astype(jnp.int32))
        local_peak = jnp.max(jnp.sum(m, axis=2))
        total = jax.lax.psum(local_total, "streams")
        active = jax.lax.psum(local_active, "streams")
        peak = jax.lax.pmax(local_peak, "streams")
        return jnp.stack([total, active, peak])

    total, active, peak = jax.jit(reduce)(out_masks)
    T, S = out_masks.shape[0], out_masks.shape[1]
    return {
        "total_emissions": int(total),
        "frames_processed": int(T * S),
        "active_streams": int(active),
        "peak_tracks_per_frame": int(peak),
    }


def per_stream_emissions(out_masks, mesh: Mesh):
    """(S,) per-stream emission counts, replicated everywhere via
    all_gather along the mesh's stream axis."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(None, "streams"),
        out_specs=P(),
        # the tiled all_gather output is replicated by construction, but
        # the static varying-axes check cannot infer that
        check_vma=False,
    )
    def gather(masks):
        local = jnp.sum(masks.astype(jnp.int32), axis=(0, 2))  # (S_local,)
        return jax.lax.all_gather(local, "streams", tiled=True)  # (S,)

    return jax.jit(gather)(out_masks)


def shard_over_streams(mesh: Mesh, arr, t_leading: bool = True):
    """Convenience: place an array with the stream axis sharded
    ((T, S, ...) when t_leading else (S, ...))."""
    spec = P(None, "streams") if t_leading else P("streams")
    return jax.device_put(arr, NamedSharding(mesh, spec))
