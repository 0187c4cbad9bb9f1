"""Variance-Preserving SDE (Song et al.); reference sde_lib/vp_sde.py."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config.registry import register_target
from .sde_lib import SDE, batch_mul

__all__ = ["VPSDE"]


@register_target("diffusion_model_nemo.modules.sde_lib.VPSDE")
class VPSDE(SDE):
    sampling_epsilon = 1e-3

    def __init__(self, beta_min: float = 0.1, beta_max: float = 20, N: int = 1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        self.compute_constants(N)

    def compute_constants(self, timesteps: int) -> None:
        """Discrete DDPM-style tables (reference vp_sde.py:29-36).

        Note the reference exposes these as ``betas``; its
        AncestralSamplingPredictor reads a never-defined ``discrete_betas``
        (ancestral_sampling_predictor.py:32) and crashes — we define both
        names so the predictor works (bug fixed, not copied).
        """
        betas = np.linspace(self.beta_0 / timesteps, self.beta_1 / timesteps, timesteps, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        self.discrete_betas = self.betas
        self.alphas = jnp.asarray(alphas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.sqrt_alphas_cumprod = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_1m_alphas_cumprod = jnp.sqrt(1.0 - self.alphas_cumprod)

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * batch_mul(beta_t, x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = batch_mul(jnp.exp(log_mean_coeff), x)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape, dtype=jnp.float32)

    def prior_logp(self, z):
        N = np.prod(z.shape[1:])
        return -N / 2.0 * math.log(2 * math.pi) - jnp.sum(
            z**2, axis=tuple(range(1, z.ndim))
        ) / 2.0

    def discretize(self, x, t):
        """DDPM discretization (reference vp_sde.py:63-71)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.betas[timestep]
        alpha = self.alphas[timestep]
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G
