"""Device-mesh / sharding utilities (SPMD data parallelism via pjit)."""

from .mesh import (
    make_mesh, shard_batch, shard_streams, replicate, data_parallel_jit,
)
from .distributed import initialize_multihost, is_primary_host
