"""SDE predictors: registry + Euler–Maruyama / reverse-diffusion / ancestral.

Parity with the reference's sde_predictors package (base_predictor.py,
euler_maruyama_predictor.py, reverse_diffusion_predictor.py,
ancestral_sampling_predictor.py). Predictors are constructed **once** at
trace time and their ``update_fn(params, x, t, key)`` is pure, so the PC
sampler can ``lax.scan`` it — the reference rebuilds predictor objects from
the registry on every step (predictor_corrector_sampler.py:130-173).

Reference bug fixed: AncestralSamplingPredictor's VP branch reads
``sde.discrete_betas`` which the reference VPSDE never defines
(ancestral_sampling_predictor.py:32); our VPSDE defines both names.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

import jax
import jax.numpy as jnp

from .sde_lib.sde_lib import SDE, batch_mul
from .sde_lib.ve_sde import VESDE
from .sde_lib.vp_sde import VPSDE

__all__ = [
    "Predictor",
    "NonePredictor",
    "EulerMaruyamaPredictor",
    "ReverseDiffusionPredictor",
    "AncestralSamplingPredictor",
    "PREDICTOR_REGISTRY",
    "register_predictor",
    "get_predictor",
]

PREDICTOR_REGISTRY: Dict[str, Type["Predictor"]] = {}


def register_predictor(cls: Type["Predictor"], name: Optional[str] = None) -> None:
    name = name or cls.__name__
    if name in PREDICTOR_REGISTRY and PREDICTOR_REGISTRY[name] is not cls:
        raise ValueError(f"Predictor {name} has already been registered !")
    PREDICTOR_REGISTRY[name] = cls


def get_predictor(name: Optional[str]) -> Optional[Type["Predictor"]]:
    if name is None:
        return None
    return PREDICTOR_REGISTRY.get(name)


class Predictor:
    """One reverse step. ``update_fn`` returns (x, x_mean)."""

    def __init__(self, sde: SDE, score_fn, probability_flow: bool = False):
        self.sde = sde
        self.rsde = sde.reverse(score_fn, probability_flow)
        self.score_fn = score_fn

    def update_fn(self, params: Any, x: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
        raise NotImplementedError()

    @classmethod
    def register_predictor(cls, name: Optional[str] = None) -> None:
        if get_predictor(name or cls.__name__) is None:
            register_predictor(cls, name=name)


class NonePredictor(Predictor):
    def __init__(self, sde=None, score_fn=None, probability_flow=False):
        pass

    def update_fn(self, params, x, t, key):
        return x, x


class EulerMaruyamaPredictor(Predictor):
    """x ← x + drift·dt + diffusion·√(−dt)·z, dt = −1/N
    (reference euler_maruyama_predictor.py:11-17)."""

    def update_fn(self, params, x, t, key):
        dt = -1.0 / self.rsde.N
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        drift, diffusion = self.rsde.sde(params, x, t)
        x_mean = x + drift * dt
        x = x_mean + batch_mul(diffusion, z) * jnp.sqrt(-dt)
        return x, x_mean


class ReverseDiffusionPredictor(Predictor):
    """Discretized reverse step x ← x − f + G·z
    (reference reverse_diffusion_predictor.py:11-16)."""

    def update_fn(self, params, x, t, key):
        f, G = self.rsde.discretize(params, x, t)
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_mean = x - f
        x = x_mean + batch_mul(G, z)
        return x, x_mean


class AncestralSamplingPredictor(Predictor):
    """VE/VP ancestral updates (reference ancestral_sampling_predictor.py)."""

    def __init__(self, sde, score_fn, probability_flow=False):
        super().__init__(sde, score_fn, probability_flow)
        if not isinstance(sde, (VPSDE, VESDE)):
            raise NotImplementedError(f"SDE class {sde.__class__.__name__} not yet supported.")
        assert not probability_flow, "Probability flow not supported by ancestral sampling"

    def vesde_update_fn(self, params, x, t, key):
        sde = self.sde
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        sigma = sde.discrete_sigmas[timestep]
        adjacent_sigma = jnp.where(timestep == 0, jnp.zeros_like(t), sde.discrete_sigmas[timestep - 1])
        score = self.score_fn(params, x, t)
        x_mean = x + batch_mul(sigma**2 - adjacent_sigma**2, score)
        std = jnp.sqrt((adjacent_sigma**2 * (sigma**2 - adjacent_sigma**2)) / (sigma**2))
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        x = x_mean + batch_mul(std, noise)
        return x, x_mean

    def vpsde_update_fn(self, params, x, t, key):
        sde = self.sde
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        beta = sde.discrete_betas[timestep]
        score = self.score_fn(params, x, t)
        x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta), x + batch_mul(beta, score))
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        x = x_mean + batch_mul(jnp.sqrt(beta), noise)
        return x, x_mean

    def update_fn(self, params, x, t, key):
        if isinstance(self.sde, VESDE):
            return self.vesde_update_fn(params, x, t, key)
        return self.vpsde_update_fn(params, x, t, key)


NonePredictor.register_predictor("none")
NonePredictor.register_predictor("null")
EulerMaruyamaPredictor.register_predictor("euler_maruyama")
ReverseDiffusionPredictor.register_predictor("reverse_diffusion")
AncestralSamplingPredictor.register_predictor("ancestral_sampling")
