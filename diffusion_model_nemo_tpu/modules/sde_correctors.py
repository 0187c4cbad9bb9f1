"""SDE correctors: registry + Langevin / annealed Langevin dynamics.

Parity with the reference's sde_correctors package (base_corrector.py,
langevin_corrector.py, annealed_langevin_dynamics_corrector.py). The
``n_steps`` inner loop unrolls at trace time (it is a small static int), so
the PC sampler scans a fully fused body.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

import jax
import jax.numpy as jnp

from .sde_lib.sde_lib import SDE, batch_mul
from .sde_lib.sub_vp_sde import subVPSDE
from .sde_lib.ve_sde import VESDE
from .sde_lib.vp_sde import VPSDE

__all__ = [
    "Corrector",
    "NoneCorrector",
    "LangevinCorrector",
    "AnnealedLangevinDynamics",
    "CORRECTOR_REGISTRY",
    "register_corrector",
    "get_corrector",
]

CORRECTOR_REGISTRY: Dict[str, Type["Corrector"]] = {}


def register_corrector(cls: Type["Corrector"], name: Optional[str] = None) -> None:
    name = name or cls.__name__
    if name in CORRECTOR_REGISTRY and CORRECTOR_REGISTRY[name] is not cls:
        raise ValueError(f"Corrector {name} has already been registered !")
    CORRECTOR_REGISTRY[name] = cls


def get_corrector(name: Optional[str]) -> Optional[Type["Corrector"]]:
    if name is None:
        return None
    return CORRECTOR_REGISTRY.get(name)


class Corrector:
    def __init__(self, sde: SDE, score_fn, snr: float, n_steps: int):
        self.sde = sde
        self.score_fn = score_fn
        self.snr = snr
        self.n_steps = n_steps

    def update_fn(self, params: Any, x: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
        raise NotImplementedError()

    @classmethod
    def register_corrector(cls, name: Optional[str] = None) -> None:
        if get_corrector(name or cls.__name__) is None:
            register_corrector(cls, name=name)

    # reference spelling kept for API compat (base_corrector.py `register_corector`)
    register_corector = register_corrector


class NoneCorrector(Corrector):
    def __init__(self, sde=None, score_fn=None, snr=0.0, n_steps=0):
        pass

    def update_fn(self, params, x, t, key):
        return x, x


def _alpha_for(sde: SDE, t: jnp.ndarray) -> jnp.ndarray:
    if isinstance(sde, (VPSDE, subVPSDE)):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        # subVPSDE has no discrete tables in the reference; alphas only exist
        # on VPSDE (langevin_corrector.py:22-25 relies on VPSDE's).
        if hasattr(sde, "alphas"):
            return sde.alphas[timestep]
        beta_t = sde.beta_0 + t * (sde.beta_1 - sde.beta_0)
        return 1.0 - beta_t / sde.N
    return jnp.ones_like(t)


class LangevinCorrector(Corrector):
    """n_steps of Langevin MCMC; step size from the target SNR and the
    grad/noise norm ratio (reference langevin_corrector.py:26-35)."""

    def __init__(self, sde, score_fn, snr, n_steps):
        super().__init__(sde, score_fn, snr, n_steps)
        if not isinstance(sde, (VPSDE, VESDE, subVPSDE)):
            raise NotImplementedError(f"SDE class {sde.__class__.__name__} not yet supported.")

    def update_fn(self, params, x, t, key):
        alpha = _alpha_for(self.sde, t)
        x_mean = x
        for _ in range(self.n_steps):
            key, sub = jax.random.split(key)
            grad = self.score_fn(params, x, t)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            grad_norm = jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1).mean()
            noise_norm = jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1).mean()
            step_size = (self.snr * noise_norm / grad_norm) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad)
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
        return x, x_mean


class AnnealedLangevinDynamics(Corrector):
    """NCSN-style ALD: step size from the marginal std
    (reference annealed_langevin_dynamics_corrector.py:32-41)."""

    def __init__(self, sde, score_fn, snr, n_steps):
        super().__init__(sde, score_fn, snr, n_steps)
        if not isinstance(sde, (VPSDE, VESDE, subVPSDE)):
            raise NotImplementedError(f"SDE class {sde.__class__.__name__} not yet supported.")

    def update_fn(self, params, x, t, key):
        alpha = _alpha_for(self.sde, t)
        std = self.sde.marginal_prob(x, t)[1]
        x_mean = x
        for _ in range(self.n_steps):
            key, sub = jax.random.split(key)
            grad = self.score_fn(params, x, t)
            noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            step_size = (self.snr * std) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad)
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
        return x, x_mean


NoneCorrector.register_corrector("none")
NoneCorrector.register_corrector("null")
LangevinCorrector.register_corrector("langevin")
AnnealedLangevinDynamics.register_corrector("ald")
