"""Variational-bound (VLB) loss for learned-variance training and bits/dim.

Parity with the reference's VariationalBoundLoss
(diffusion_model_nemo/loss/variational_bound_loss.py): per-element term is
``KL(q(x_{t-1}|x_t,x₀) ‖ p_θ)/ln2`` for t>0 and the discretized-Gaussian
decoder NLL at t=0; ``weight`` (default 0.001) scales the loss;
``detach_model_mean`` stop-grads the mean so only the variance learns from
the VLB.

Reference bug fixed (not copied): the reference's ``forward`` reduction
branches reference an undefined ``decoder_nll`` local and its declared
2-tuple return can never work (variational_bound_loss.py:82-91). Here the
decoder NLL is computed once, reduced consistently, and returned properly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config.registry import register_target
from ..ops.math import (
    LOG2,
    discretized_gaussian_log_likelihood,
    mean_flattened,
    normal_kl,
)

__all__ = ["VariationalBoundLoss", "compute_variational_loss_terms"]


def compute_variational_loss_terms(
    samples: jnp.ndarray,
    model_mean: jnp.ndarray,
    model_log_variance: jnp.ndarray,
    true_mean: jnp.ndarray,
    true_log_variance_clipped: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-example VLB terms in bits; returns ``(vb_losses, decoder_nll)``,
    both shape ``[B]`` (reference variational_bound_loss.py:36-57)."""
    model_log_variance = jnp.broadcast_to(model_log_variance, model_mean.shape)

    kl = normal_kl(true_mean, true_log_variance_clipped, model_mean, model_log_variance)
    kl = mean_flattened(kl) / LOG2

    decoder_nll = -discretized_gaussian_log_likelihood(
        samples, means=model_mean, log_scales=0.5 * model_log_variance
    )
    decoder_nll = mean_flattened(decoder_nll) / LOG2

    vb_losses = jnp.where(t == 0, decoder_nll, kl)
    return vb_losses, decoder_nll


@register_target("diffusion_model_nemo.loss.VariationalBoundLoss")
class VariationalBoundLoss:
    def __init__(
        self,
        weight: float = 0.001,
        detach_model_mean: bool = True,
        reduction: str = "mean",
    ):
        self.loss_weight = weight
        self.detach_model_mean = detach_model_mean
        self.reduction = reduction

    compute_variation_loss_terms = staticmethod(compute_variational_loss_terms)

    def __call__(
        self,
        samples: jnp.ndarray,
        model_mean: jnp.ndarray,
        model_log_variance: jnp.ndarray,
        true_mean: jnp.ndarray,
        true_log_variance_clipped: jnp.ndarray,
        t: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.detach_model_mean:
            model_mean = jax.lax.stop_gradient(model_mean)

        vb_losses, decoder_nll = compute_variational_loss_terms(
            samples=samples,
            model_mean=model_mean,
            model_log_variance=model_log_variance,
            true_mean=true_mean,
            true_log_variance_clipped=true_log_variance_clipped,
            t=t,
        )
        vb_losses = self.loss_weight * vb_losses

        if self.reduction in ("mean", "batch_mean"):
            # terms are already per-sample scalars; both reduce to batch mean
            return vb_losses.mean(), decoder_nll.mean()
        if self.reduction == "sum":
            return vb_losses.sum(), decoder_nll.sum()
        return vb_losses, decoder_nll
