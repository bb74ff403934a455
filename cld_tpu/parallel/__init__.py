"""Device mesh + sharding: SPMD data parallelism over ICI."""

from cld_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
