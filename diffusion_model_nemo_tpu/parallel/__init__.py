from .mesh import (
    data_sharding,
    local_device_count,
    make_mesh,
    mesh_cache_key,
    put_global_batch,
    replicated_sharding,
    sample_shardings,
    shard_batch,
)
from .sharding import (
    STRATEGIES,
    infer_param_shardings,
    make_strategy_mesh,
    param_shardings_for_strategy,
)
