from .yaml_config import (
    MISSING,
    Config,
    apply_overrides,
    from_dict,
    load_config,
    merge,
    resolve_interpolations,
    to_dict,
    to_yaml,
)
from .registry import TARGET_REGISTRY, get_target, instantiate, register_target
