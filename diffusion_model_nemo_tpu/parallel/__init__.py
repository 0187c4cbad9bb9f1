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
from .pipeline import pipeline_apply, pipeline_spec, stack_pipeline_params
from .ring_attention import (
    ring_attention_local,
    sequence_parallel_dit_apply,
    sequence_sharded_attention,
)
from .sharding import (
    STRATEGIES,
    expert_param_shardings,
    infer_param_shardings,
    make_strategy_mesh,
    param_shardings_for_strategy,
)
