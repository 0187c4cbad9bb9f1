"""Continuous score-matching loss + the canonical score-function adapter.

Parity with the reference's SDEScoreFunctionLoss
(diffusion_model_nemo/loss/sde_loss/score_function_loss.py), including
``resolve_score_function`` — the adapter used by every SDE sampler and the
likelihood estimator: for VP/subVP the network output is scaled by −1/std and
fed ``t·(N−1)`` as the time label; for VE the marginal σ (continuous) or the
reversed discrete index is the label (reference :47-91).

TPU changes: the model is ``model_fn(params, x, t)`` with explicit params;
``t`` scaling and perturbation happen inside the jitted train step; noise is
caller-provided (explicit keys).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp

from ..config.registry import register_target
from ..modules.sde_lib.sde_lib import SDE, batch_mul
from ..modules.sde_lib.score_fn import resolve_score_function

__all__ = ["SDEScoreFunctionLoss", "resolve_score_function"]


@register_target("diffusion_model_nemo.loss.SDEScoreFunctionLoss")
class SDEScoreFunctionLoss:
    def __init__(
        self,
        continuous: bool = True,
        likelihood_weighting: bool = True,
        eps: float = 1e-5,
        reduction: str = "mean",
    ):
        self.continuous = continuous
        self.likelihood_weighting = likelihood_weighting
        self.eps = eps
        self.reduction = reduction
        self.sde: Optional[SDE] = None

    def update_sde(self, sde: SDE) -> None:
        self.sde = sde

    resolve_score_function = staticmethod(resolve_score_function)

    def __call__(
        self,
        model_fn,
        params: Any,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """t is uniform in [0, 1); scaled to [eps, T] here
        (reference score_function_loss.py:94-126)."""
        if self.sde is None:
            raise RuntimeError("Must set the SDE solver via `update_sde()` !")
        sde = self.sde
        t = t * (sde.T - self.eps) + self.eps
        z = noise

        if self.reduction == "batch_mean":
            reduce_op = lambda x: x.reshape(x.shape[0], -1).sum(-1)
        elif self.reduction == "mean":
            reduce_op = lambda x: x.reshape(x.shape[0], -1).mean(-1)
        elif self.reduction == "sum":
            reduce_op = lambda x: 0.5 * x.reshape(x.shape[0], -1).sum(-1)
        else:
            reduce_op = lambda x: x

        score_fn = resolve_score_function(model_fn, sde=sde, continuous=self.continuous)
        mean, std = sde.marginal_prob(x_start, t)
        perturbed_data = mean + batch_mul(std, noise) if std.ndim == 1 else mean + std * noise
        score = score_fn(params, perturbed_data, t)

        if not self.likelihood_weighting:
            losses = jnp.square(batch_mul(std, score) + z) if std.ndim == 1 else jnp.square(score * std + z)
            losses = reduce_op(losses)
        else:
            g2 = sde.sde(jnp.zeros_like(x_start), t)[1] ** 2
            losses = jnp.square(score + batch_mul(1.0 / std, z)) if std.ndim == 1 else jnp.square(score + z / std)
            losses = reduce_op(losses) * g2

        return losses.mean()
