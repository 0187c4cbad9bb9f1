"""Persistent XLA compilation cache (opt-in).

The reference rig pays real money for compiles: through the remote-TPU
tunnel a U-Net train step is ~1-2 min and a 1000-step sampling scan 5-8 min
of XLA time, repeated on every process start (the reference's torch eager
path has no analogue — this is a TPU-framework service, SURVEY §5 "framework
services"). JAX ships a persistent on-disk cache keyed on (HLO, compile
options, backend version); measured on this rig it turns a 7.6 s conv-stack
grad compile into 0.17 s on the next process, and it works through the axon
tunnel because the cache stores the serialized executable client-side.

Opt-in surfaces (all route here):
  - env        ``DMN_COMPILE_CACHE_DIR=/path`` (honored at package import)
  - Trainer    ``trainer.compile_cache_dir: /path`` (YAML)
  - serving    ``compile_cache_dir=/path`` (examples/serve.py) — a restarted
               daemon re-enters service without re-paying the sampler compile.

Not enabled by default: the cache directory grows unboundedly and is keyed
on jaxlib/XLA versions, so stale entries survive upgrades; production opts
in with a managed path.
"""

from __future__ import annotations

import os
from typing import Optional

from . import logging

__all__ = ["enable_persistent_compilation_cache", "maybe_enable_from_env"]

_ENV_VAR = "DMN_COMPILE_CACHE_DIR"
_enabled_dir: Optional[str] = None


def enable_persistent_compilation_cache(
    cache_dir: str,
    min_compile_time_secs: float = 1.0,
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing). Idempotent; re-pointing at a different directory is allowed and
    logged. Returns the absolute cache path.

    ``min_compile_time_secs`` skips caching trivial compiles (dispatch-level
    ``jit_broadcast_in_dim`` entries are pennies; the scans are the prize).
    """
    global _enabled_dir
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    if _enabled_dir == cache_dir:
        return cache_dir
    if _enabled_dir is not None:
        logging.warning(
            f"persistent compilation cache moving {_enabled_dir} -> {cache_dir}"
        )
        # jax materializes the cache object lazily on first use and then
        # ignores jax_compilation_cache_dir updates; drop it so the new
        # directory actually takes effect mid-process.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # pragma: no cover - jax-version dependent
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # Cache regardless of entry size; the big sampler executables are the
    # point and small ones are filtered by compile time above.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = cache_dir
    logging.info(f"persistent XLA compilation cache: {cache_dir}")
    return cache_dir


def maybe_enable_from_env() -> Optional[str]:
    """Honor ``DMN_COMPILE_CACHE_DIR`` if set (called at package import)."""
    path = os.environ.get(_ENV_VAR, "").strip()
    if not path:
        return None
    return enable_persistent_compilation_cache(path)
