"""Exponential moving average of parameters.

The reference has no EMA (the north-star spec requires it; we add it as a
framework service). Runs inside the jitted train step — a fused multiply-add
over the parameter pytree per update.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ema_update", "init_ema"]


def init_ema(params: Any) -> Any:
    # A real copy, not an alias: params and ema are both donated by the train
    # step, and donating the same buffer twice is an XLA error.
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params: Any, params: Any, decay: float, step: jnp.ndarray = None) -> Any:
    """ema ← decay·ema + (1−decay)·params, with optional warmup ramp
    ``min(decay, (1+step)/(10+step))`` when ``step`` is given."""
    if step is not None:
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    else:
        d = decay
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)
