from .sharding import (
    make_mesh,
    param_partition_specs,
    shard_params,
    batch_partition_spec,
)
