"""Mesh construction and sharding rules.

The reference's distributed story is NCCL DDP managed by torchrun
(/root/reference/model/DREAM_Train.py:675-680, MvRoPose_FR3.py:910-917):
user-level process groups, explicit all_reduce flag syncs, object broadcasts
and dummy-gradient alignment tricks. None of that exists here - SPMD under
jit over a `jax.sharding.Mesh` makes gradient all-reduce implicit (XLA
inserts psums over ICI), object broadcast unnecessary (every process builds
the same arrays), and empty-batch alignment a non-problem (identical programs
execute everywhere; empty slots are masked by weight 0).

Axes:
  data  - batch sharding (the reference's only parallelism, DDP-equivalent)
  model - attention-head / MLP sharding of the fusion + heads (beyond the
          reference: lets a big rig batch scale across chips even at B=1)
"""

from mvropose_tpu.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    replicate,
    shard_batch,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "replicate",
    "shard_batch",
]
