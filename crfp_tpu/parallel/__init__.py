from crfp_tpu.parallel.sharding import (
    data_parallel_mesh,
    global_mesh,
    initialize_distributed,
    replicate,
    shard_batch,
)
from crfp_tpu.parallel.spatial import halo_exchange, sharded_conv3x3, shard_frame_height

__all__ = [
    "data_parallel_mesh",
    "global_mesh",
    "initialize_distributed",
    "shard_batch",
    "replicate",
    "halo_exchange",
    "sharded_conv3x3",
    "shard_frame_height",
]
