"""Abstract SDE classes and the reverse-time SDE/ODE.

Functional JAX counterpart of the reference's sde_lib
(diffusion_model_nemo/modules/sde_lib/sde_lib.py). Score functions carry
``params`` explicitly — ``score_fn(params, x, t)`` — so jitted samplers don't
bake weights into the trace. ``reverse()`` returns a lightweight holder of
pure drift/discretize closures instead of dynamically subclassing.
"""

from __future__ import annotations

import abc
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SDE", "ReverseSDE", "batch_mul"]

# score_fn(params, x, t) -> score
ScoreFn = Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def batch_mul(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply per-batch scalars ``a`` [B] (or a 0-d scalar — the samplers'
    fast path where one t serves the whole batch) against ``x`` [B, ...]."""
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a * x
    return a.reshape(a.shape[0], *((1,) * (x.ndim - 1))) * x


class ReverseSDE:
    """Reverse-time SDE/ODE built from a forward SDE + score function.

    drift ← drift − G²·score·(½ if probability_flow else 1);
    diffusion zeroed for the ODE (reference sde_lib.py:69-107).
    """

    def __init__(self, fsde: "SDE", score_fn: ScoreFn, probability_flow: bool = False):
        self.fsde = fsde
        self.score_fn = score_fn
        self.probability_flow = probability_flow
        self.N = fsde.N
        self.T = fsde.T

    def sde(self, params: Any, x: jnp.ndarray, t: jnp.ndarray):
        drift, diffusion = self.fsde.sde(x, t)
        score = self.score_fn(params, x, t)
        factor = 0.5 if self.probability_flow else 1.0
        drift = drift - batch_mul(diffusion**2, score) * factor
        diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return drift, diffusion

    def discretize(self, params: Any, x: jnp.ndarray, t: jnp.ndarray):
        f, G = self.fsde.discretize(x, t)
        factor = 0.5 if self.probability_flow else 1.0
        rev_f = f - batch_mul(G**2, self.score_fn(params, x, t)) * factor
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G


class SDE(abc.ABC):
    """SDE abstract class operating on mini-batches (reference sde_lib.py:7-67)."""

    sampling_epsilon: float = None

    def __init__(self, N: int):
        if self.sampling_epsilon is None:
            raise ValueError("Sampling epsilon cannot be None ! Must be set as a class variable !")
        self.N = int(N)

    @property
    @abc.abstractmethod
    def T(self) -> float:
        """End time of the SDE."""

    @abc.abstractmethod
    def sde(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward drift f(x, t) and diffusion g(t)."""

    @abc.abstractmethod
    def marginal_prob(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean/std of the marginal p_t(x)."""

    @abc.abstractmethod
    def prior_sampling(self, key: jax.Array, shape) -> jnp.ndarray:
        """One sample from the prior p_T."""

    @abc.abstractmethod
    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        """Prior log-density, for likelihood via the probability-flow ODE."""

    def discretize(self, x: jnp.ndarray, t: jnp.ndarray):
        """Euler–Maruyama default: x_{i+1} = x_i + f_i + G_i z_i
        (reference sde_lib.py:53-67)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        f = drift * dt
        G = diffusion * jnp.sqrt(jnp.asarray(dt, dtype=jnp.float32))
        return f, G

    def reverse(self, score_fn: ScoreFn, probability_flow: bool = False) -> ReverseSDE:
        return ReverseSDE(self, score_fn, probability_flow)
