"""L_simple: l1 / l2 / huber between model output and target noise.

Parity with the reference's DiffusionLoss (diffusion_model_nemo/loss/
simple_loss.py): reductions ``mean``/``sum``/``none``/``batch_mean``
(per-sample sum then batch mean). Huber matches torch's
``smooth_l1_loss`` (beta = 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config.registry import register_target

__all__ = ["DiffusionLoss"]

_LOSS_TYPES = ("l1", "l2", "huber")
_REDUCTIONS = ("mean", "sum", "none", "batch_mean")


@register_target("diffusion_model_nemo.loss.DiffusionLoss")
class DiffusionLoss:
    def __init__(self, loss_type: str, reduction: str = "mean"):
        assert loss_type in _LOSS_TYPES, f"Loss type {loss_type} is not implemented !"
        assert reduction in _REDUCTIONS, f"Invalid reduction {reduction}"
        self.loss_type = loss_type
        self.reduction = reduction

    def elementwise(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Unreduced per-element loss (used by per-sample weightings like
        Min-SNR-γ, models/ddpm.py)."""
        if self.loss_type == "l1":
            return jnp.abs(input - target)
        if self.loss_type == "l2":
            return (input - target) ** 2
        # huber, beta=1 (torch smooth_l1_loss default)
        diff = jnp.abs(input - target)
        return jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        loss = self.elementwise(input, target)

        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        if self.reduction == "batch_mean":
            return loss.reshape(loss.shape[0], -1).sum(-1).mean()
        return loss
