"""Multi-chip scaling via jax.sharding.

The reference has no DP/TP/PP (it is not an ML system — SURVEY.md §2.7);
its scale axes are object count and world count.  On TPU we scale:

- **World-instance data parallelism** (``worlds`` mesh axis): a server hosts
  many independent world instances (the reference's ServerAllWorldsState has
  many named worlds, server/ServerWorldState.cpp); each device steps a shard
  of worlds with an identical program; diagnostics reduce with psum.
- **Audio source parallelism** (``sources`` axis): N-source downmix is a
  sum-reduction over sources, so sources shard across devices and the stereo
  mix reduces with psum over ICI (tensor-parallel-style).
- **Spatial domain decomposition** (``spatial.py``): ONE world split into
  x-slabs, boundary bodies ppermuted to neighbours as fixed-size halos each
  step — the axis for single worlds larger than one chip.
"""

from substrata_tpu.parallel.mesh import make_mesh, multi_world_step  # noqa: F401
from substrata_tpu.parallel.spatial import (  # noqa: F401
    partition_by_slab, shard_partitioned, spatial_world_step,
)
