"""Minimal Hydra/OmegaConf-style config layer.

The reference delegates its whole config surface to Hydra + OmegaConf:
YAML trees with ``${a.b}`` interpolation, dotted CLI overrides, and
``_target_``-driven object instantiation (reference
examples/ddpm/train_ddpm.py:64, models/ddpm.py:27-29). Neither library is
available here, so this module provides the same public surface on plain
dicts:

- :class:`Config` — an attribute-access dict wrapper with ``.get``, item
  access, and YAML round-trip.
- :func:`load_config` / :func:`to_yaml`
- :func:`apply_overrides` — ``a.b.c=value`` dotted overrides (with ``+`` to
  add new keys, ``null``/ ``true``/ list literals parsed as YAML).
- :func:`resolve_interpolations` — ``${path.to.key}`` substitution from the
  config root.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, Iterable, List, Mapping, Optional, Union

import yaml

# pyyaml (YAML 1.1) parses `1e-5` as a *string* (the spec demands `1.0e-5`);
# Hydra/OmegaConf accept the bare form and the reference's YAML uses it
# (e.g. `min_lr: 1e-4`, `eps: 1e-5`). Patch a YAML-1.2-style float resolver
# into a dedicated loader so scientific notation round-trips as float.
class _FloatSafeLoader(yaml.SafeLoader):
    pass


_FloatSafeLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:
         [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text):
    return yaml.load(text, Loader=_FloatSafeLoader)


__all__ = [
    "Config",
    "load_config",
    "to_yaml",
    "from_dict",
    "to_dict",
    "apply_overrides",
    "resolve_interpolations",
    "merge",
    "MISSING",
]

# Hydra's mandatory-value marker ``???`` parses from YAML as the string "???".
MISSING = "???"

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """Dict with attribute access and nested-wrapping semantics."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, name, value) -> None:
        super().__setitem__(name, _wrap(value))

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def copy(self) -> "Config":
        return copy.deepcopy(self)


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def from_dict(d: Optional[Mapping]) -> Config:
    return _wrap(dict(d) if d else {})


def to_dict(cfg: Any) -> Any:
    """Recursively convert Config → plain dict (for YAML dump / checkpoints)."""
    if isinstance(cfg, Mapping):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def to_yaml(cfg: Any) -> str:
    return yaml.safe_dump(to_dict(cfg), sort_keys=False, default_flow_style=None)


def load_config(
    path: Union[str, Path], overrides: Optional[Iterable[str]] = None, resolve: bool = True
) -> Config:
    with open(path) as f:
        cfg = from_dict(_yaml_load(f.read()) or {})
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if resolve:
        cfg = resolve_interpolations(cfg)
    return cfg


def merge(base: Mapping, *others: Mapping) -> Config:
    """Deep-merge dicts; later values win (like OmegaConf.merge)."""
    out = from_dict(base)
    for other in others:
        _merge_into(out, other)
    return out


def _merge_into(dst: Config, src: Mapping) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Mapping) and isinstance(v, Mapping):
            _merge_into(dst[k], v)
        else:
            dst[k] = _wrap(v)


def apply_overrides(cfg: Config, overrides: Iterable[str]) -> Config:
    """Apply ``key.path=value`` overrides; ``+key.path=value`` creates new keys."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override `{ov}` must look like key.path=value")
        key, _, raw = ov.partition("=")
        allow_new = key.startswith("+")
        key = key.lstrip("+~")
        value = _yaml_load(raw) if raw != "" else None
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                if not allow_new:
                    raise KeyError(f"Override key `{key}` not found (use +{key}= to add)")
                node[p] = Config()
            node = node[p]
            if not isinstance(node, Mapping):
                raise KeyError(f"Override key `{key}` traverses non-dict node `{p}`")
        leaf = parts[-1]
        if leaf not in node and not allow_new:
            raise KeyError(f"Override key `{key}` not found (use +{key}= to add)")
        node[leaf] = _wrap(value)
    return cfg


def _lookup(root: Mapping, dotted: str) -> Any:
    node: Any = root
    for p in dotted.split("."):
        if isinstance(node, Mapping) and p in node:
            node = node[p]
        else:
            raise KeyError(f"Interpolation `${{{dotted}}}` not found in config")
    return node


def resolve_interpolations(cfg: Config, _root: Optional[Config] = None) -> Config:
    """Substitute ``${a.b}`` references against the config root (iteratively,
    so chained interpolations resolve)."""
    root = cfg if _root is None else _root

    def resolve_value(v: Any) -> Any:
        if isinstance(v, str):
            m = _INTERP_RE.fullmatch(v)
            if m:  # whole-string interpolation keeps the referenced type
                out = _lookup(root, m.group(1))
                return resolve_value(out)
            return _INTERP_RE.sub(lambda mm: str(resolve_value(_lookup(root, mm.group(1)))), v)
        if isinstance(v, Mapping):
            return Config({k: resolve_value(x) for k, x in v.items()})
        if isinstance(v, list):
            return [resolve_value(x) for x in v]
        return v

    return resolve_value(cfg)
