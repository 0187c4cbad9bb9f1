"""``_target_`` registry + instantiate — the public extension mechanism.

The reference builds every swappable component (network, sampler, loss, SDE)
via ``hydra.utils.instantiate`` on a ``_target_`` class path
(e.g. models/ddpm.py:27-29, eval_ddpm.py:52-59). This module reproduces that
surface: YAML keeps the *same* ``_target_`` strings as the reference
(``diffusion_model_nemo.modules.GaussianDiffusion``...), and the registry maps
them — plus our native ``diffusion_model_nemo_tpu...`` paths — to JAX
factories. Unknown targets fall back to a real dotted import.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Mapping, Optional

from .yaml_config import Config, to_dict

__all__ = ["register_target", "get_target", "instantiate", "TARGET_REGISTRY"]

TARGET_REGISTRY: Dict[str, Callable] = {}

# Reference package prefixes that should transparently resolve to ours, so the
# reference's YAML files work unmodified.
_ALIAS_PREFIXES = {
    "diffusion_model_nemo.": "diffusion_model_nemo_tpu.",
}


def register_target(*names: str) -> Callable:
    """Class/function decorator registering one or more ``_target_`` names."""

    def deco(obj: Callable) -> Callable:
        for name in names:
            if name in TARGET_REGISTRY and TARGET_REGISTRY[name] is not obj:
                raise ValueError(f"_target_ `{name}` already registered")
            TARGET_REGISTRY[name] = obj
        # Auto-register the object's own dotted path and its short name.
        auto = f"{obj.__module__}.{obj.__qualname__}"
        TARGET_REGISTRY.setdefault(auto, obj)
        TARGET_REGISTRY.setdefault(obj.__qualname__, obj)
        return obj

    return deco


def get_target(name: str) -> Callable:
    if name in TARGET_REGISTRY:
        return TARGET_REGISTRY[name]
    for prefix, ours in _ALIAS_PREFIXES.items():
        if name.startswith(prefix):
            # Try the registry first with the aliased leaf class name.
            leaf = name.rsplit(".", 1)[-1]
            if leaf in TARGET_REGISTRY:
                return TARGET_REGISTRY[leaf]
            name = ours + name[len(prefix) :]
            break
    # Fallback: genuine import of module.attr
    module_name, _, attr = name.rpartition(".")
    try:
        module = importlib.import_module(module_name)
        return getattr(module, attr)
    except (ImportError, AttributeError) as e:
        raise ImportError(f"Cannot resolve _target_ `{name}`: {e}") from e


def instantiate(cfg: Optional[Mapping], *args: Any, **kwargs: Any) -> Any:
    """Build the object named by ``cfg._target_`` with cfg fields as kwargs.

    Mirrors ``hydra.utils.instantiate`` semantics for the subset the reference
    uses: non-recursive kwargs (nested dicts are passed through as configs),
    call-site kwargs override config fields.
    """
    if cfg is None:
        return None
    if "_target_" not in cfg:
        raise ValueError(f"instantiate() requires a `_target_` key; got {sorted(cfg)}")
    target = get_target(str(cfg["_target_"]))
    cfg_kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
    cfg_kwargs.update(kwargs)
    return target(*args, **cfg_kwargs)
