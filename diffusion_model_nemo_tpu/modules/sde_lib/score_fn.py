"""The canonical score-function adapter (used by losses, samplers, likelihood).

Matches the reference's ``SDEScoreFunctionLoss.resolve_score_function``
(diffusion_model_nemo/loss/sde_loss/score_function_loss.py:47-91): for
VP/subVP the network output is scaled by −1/std and fed ``t·(N−1)`` as the
time label; for VE the marginal σ (continuous) or the reversed discrete index
is the label. Lives in sde_lib (not the loss package) so samplers don't pull
in the loss layer.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .sde_lib import SDE, batch_mul
from .sub_vp_sde import subVPSDE
from .ve_sde import VESDE
from .vp_sde import VPSDE

__all__ = ["resolve_score_function"]


def _batched(labels: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """The network's time input is always [B]; samplers may pass a scalar t
    (one t for the whole batch — the fast path avoiding per-batch gathers)."""
    labels = jnp.asarray(labels)
    if labels.ndim == 0:
        return jnp.broadcast_to(labels, (x.shape[0],))
    return labels


def resolve_score_function(model_fn, sde: SDE, continuous: bool = True):
    """Wrap ``model_fn(params, x, labels)`` into ``score_fn(params, x, t)``.

    ``t`` may be [B] or a 0-d scalar (see :func:`_batched`).
    """
    if isinstance(sde, (VPSDE, subVPSDE)):

        def score_fn(params: Any, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
            if continuous or isinstance(sde, subVPSDE):
                labels = t * (sde.N - 1)
                score = model_fn(params, x, _batched(labels, x))
                _, std = sde.marginal_prob(jnp.zeros_like(x), t)
            else:
                labels = (t * (sde.N - 1)).astype(jnp.int32)
                score = model_fn(params, x, _batched(labels, x))
                std = sde.sqrt_1m_alphas_cumprod[labels]
            return batch_mul(-1.0 / std, score) if std.ndim <= 1 else -score / std

    elif isinstance(sde, VESDE):

        def score_fn(params: Any, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
            return model_fn(params, x, _batched(labels, x))

    else:
        raise NotImplementedError(f"SDE class {sde.__class__.__name__} not yet supported.")

    return score_fn
