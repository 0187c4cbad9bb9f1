"""Sub-VP SDE (likelihood-oriented); reference sde_lib/sub_vp_sde.py."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config.registry import register_target
from .sde_lib import SDE, batch_mul

__all__ = ["subVPSDE"]


@register_target("diffusion_model_nemo.modules.sde_lib.subVPSDE")
class subVPSDE(SDE):
    sampling_epsilon = 1e-3

    def __init__(self, beta_min: float = 0.1, beta_max: float = 20, N: int = 1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * batch_mul(beta_t, x)
        discount = 1.0 - jnp.exp(-2 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = batch_mul(jnp.exp(log_mean_coeff), x)
        std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32)

    def prior_logp(self, z):
        N = np.prod(z.shape[1:])
        return -N / 2.0 * math.log(2 * math.pi) - jnp.sum(
            z**2, axis=tuple(range(1, z.ndim))
        ) / 2.0
