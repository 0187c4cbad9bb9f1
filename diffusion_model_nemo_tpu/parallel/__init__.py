from .mesh import (
    data_sharding,
    local_device_count,
    make_mesh,
    put_global_batch,
    replicated_sharding,
    shard_batch,
)
