"""EDM training loss — Karras et al. 2022 (arXiv:2206.00364), eq. 2 + Table 1.

The paper's objective is the lambda-weighted D-space MSE

    E [ lambda(sigma) * || D(x0 + sigma eps; sigma) - x0 ||^2 ],
    lambda(sigma) = (sigma^2 + sigma_d^2) / (sigma sigma_d)^2.

With the EDM preconditioning lambda(sigma) * c_out(sigma)^2 = 1 exactly, so
the same quantity equals the unit-weight MSE on the raw network output
against the effective target (x0 - c_skip * x) / c_out. This class computes
the D-space form directly (the identity is pinned in tests/test_edm.py);
``reduction`` semantics match DiffusionLoss.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config.registry import register_target

__all__ = ["EDMLoss"]

_REDUCTIONS = ("mean", "sum", "none", "batch_mean")


@register_target(
    "diffusion_model_nemo.loss.EDMLoss",
    "diffusion_model_nemo_tpu.loss.EDMLoss",
)
class EDMLoss:
    def __init__(self, sigma_data: float = 0.5, reduction: str = "mean"):
        assert reduction in _REDUCTIONS, f"Invalid reduction {reduction}"
        if float(sigma_data) <= 0.0:
            raise ValueError(f"sigma_data must be > 0, got {sigma_data}")
        self.sigma_data = float(sigma_data)
        self.reduction = reduction

    def weight(self, sigma: jnp.ndarray) -> jnp.ndarray:
        sigma = jnp.asarray(sigma, jnp.float32)
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2

    def __call__(
        self, input: jnp.ndarray, target: jnp.ndarray, sigma: jnp.ndarray
    ) -> jnp.ndarray:
        """input = D(x_sigma; sigma), target = x0, sigma = [B] noise levels."""
        w = self.weight(sigma).reshape((-1,) + (1,) * (input.ndim - 1))
        loss = w * (input.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        if self.reduction == "batch_mean":
            return loss.reshape(loss.shape[0], -1).sum(-1).mean()
        return loss
