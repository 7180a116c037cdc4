"""Multi-device parallelism: batched/sharded solves over a device mesh.

Replaces the reference's thread-per-guess multistart
(reference optimization/multistart.hpp) with vmapped solver states sharded
across a `jax.sharding.Mesh`.
"""

from sleipnir_tpu.parallel.batch import (
    default_mesh,
    make_batched_runner,
    multistart_batched,
    shard_batch,
    solve_ipm_batched,
)

__all__ = [
    "default_mesh",
    "make_batched_runner",
    "multistart_batched",
    "shard_batch",
    "solve_ipm_batched",
]
