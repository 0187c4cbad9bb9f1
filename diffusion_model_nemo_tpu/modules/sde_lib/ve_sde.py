"""Variance-Exploding SDE (NCSN/SMLD); reference sde_lib/ve_sde.py."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config.registry import register_target
from .sde_lib import SDE

__all__ = ["VESDE"]


@register_target("diffusion_model_nemo.modules.sde_lib.VESDE")
class VESDE(SDE):
    sampling_epsilon = 1e-5

    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 50, N: int = 1000):
        super().__init__(N)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.discrete_sigmas = jnp.exp(
            jnp.linspace(math.log(self.sigma_min), math.log(self.sigma_max), N)
        )

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(2 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32) * self.sigma_max

    def prior_logp(self, z):
        N = np.prod(z.shape[1:])
        return -N / 2.0 * math.log(2 * math.pi * self.sigma_max**2) - jnp.sum(
            z**2, axis=tuple(range(1, z.ndim))
        ) / (2 * self.sigma_max**2)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization with adjacent sigma (reference ve_sde.py:50-59)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigma = self.discrete_sigmas[timestep]
        adjacent_sigma = jnp.where(timestep == 0, jnp.zeros_like(t), self.discrete_sigmas[timestep - 1])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent_sigma**2)
        return f, G
