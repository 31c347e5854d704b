"""Stream-parallel execution over TPU device meshes.

The reference is a single-threaded per-frame library with no distributed
layer (SURVEY.md §2.8; reference docs/guides/architecture.md:246-258
suggests one tracker per OpenMP thread). The TPU-native scaling axis is
*streams*: S independent videos batch into fixed-shape arrays, vmap over
the stream axis, scan over frames, and shard streams across chips with
``shard_map`` over a ``jax.sharding.Mesh`` — no collectives needed in
the hot loop because streams are independent; ICI traffic only appears
in result gathering.
"""

from motcpp_tpu.parallel.collectives import (
    emission_stats,
    per_stream_emissions,
    shard_over_streams,
)
from motcpp_tpu.parallel.streams import (
    MultiStreamRunner,
    make_rollout,
    make_rollout_embs,
    make_rollout_general,
)

__all__ = [
    "MultiStreamRunner",
    "make_rollout",
    "make_rollout_embs",
    "make_rollout_general",
    "emission_stats",
    "per_stream_emissions",
    "shard_over_streams",
]
