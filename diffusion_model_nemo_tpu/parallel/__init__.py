from .mesh import (
    data_sharding,
    local_device_count,
    make_mesh,
    put_global_batch,
    replicated_sharding,
    shard_batch,
)
from .sharding import (
    STRATEGIES,
    infer_param_shardings,
    make_strategy_mesh,
    param_shardings_for_strategy,
)
