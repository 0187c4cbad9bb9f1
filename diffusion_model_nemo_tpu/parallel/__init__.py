from .mesh import (
    data_sharding,
    local_device_count,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
