"""Unbiased NLL (bits/dim) via the probability-flow ODE.

TPU-native redesign of the reference's LikelihoodEstimate
(diffusion_model_nemo/modules/sde_lib/likelihood.py): the Hutchinson–Skilling
divergence uses one in-graph ``jax.vjp`` per drift evaluation, and the
augmented [x, logp] ODE integrates with the in-graph RK45 — the reference
round-trips numpy↔torch on every solver stage.

Conventions preserved: rademacher/gaussian trace noise, integration span
``(eps, T)``, bits/dim offset +7.0 for data scaled to [-1, 1]
(likelihood.py:91-102).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config.registry import register_target
from .score_fn import resolve_score_function
from ...ops.ode import odeint_rk45, poison_on_failure
from .sde_lib import SDE

__all__ = ["LikelihoodEstimate"]


@register_target("diffusion_model_nemo.modules.LikelihoodEstimate")
class LikelihoodEstimate:
    def __init__(
        self,
        hutchinson_type: str = "rademacher",
        method: str = "RK45",
        rtol: float = 1e-5,
        atol: float = 1e-5,
        eps: float = 1e-5,
        max_steps: int = 10_000,
    ):
        hutchinson_type = hutchinson_type.lower()
        if hutchinson_type not in ("rademacher", "gaussian"):
            raise ValueError("`hutchinson_type` must be one of `rademacher` or `gaussian`")
        if method.upper() != "RK45":
            raise ValueError("Only RK45 (Dormand-Prince) is supported in-graph")
        self.hutchinson_type = hutchinson_type
        self.rtol = rtol
        self.atol = atol
        self.eps = eps
        self.max_steps = max_steps
        self.sde: Optional[SDE] = None
        self.version = 0

    def update_sde(self, sde: SDE) -> None:
        self.sde = sde
        self.version += 1

    def drift_fn(self, model_fn, params, x, t):
        score_fn = resolve_score_function(model_fn, self.sde, continuous=True)
        rsde = self.sde.reverse(score_fn, probability_flow=True)
        return rsde.sde(params, x, t)[0]

    def likelihood(
        self, model_fn, params: Any, data: jnp.ndarray, key: jax.Array
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (bits/dim [B], latent z, nfe)."""
        if self.sde is None:
            raise ValueError("Must explicitly set `update_sde(sde)` first")
        shape = data.shape
        B = shape[0]

        if self.hutchinson_type == "gaussian":
            epsilon = jax.random.normal(key, shape, dtype=jnp.float32)
        else:
            epsilon = (
                jax.random.randint(key, shape, 0, 2).astype(jnp.float32) * 2.0 - 1.0
            )

        def drift_div(x, t_vec):
            """Drift + Hutchinson divergence εᵀJε via one vjp (reverse-mode,
            like the reference's autograd grad of sum(f·ε) — and compatible
            with the custom_vjp Pallas kernels, which forward-mode isn't)."""
            f = lambda y: self.drift_fn(model_fn, params, y, t_vec)
            drift, pullback = jax.vjp(f, x)
            (eps_J,) = pullback(epsilon)
            div = jnp.sum(eps_J * epsilon, axis=tuple(range(1, x.ndim)))
            return drift, div

        def ode_func(t, state):
            x, _logp = state
            drift, div = drift_div(x, t)
            return (drift, div)

        init = (data.astype(jnp.float32), jnp.zeros((B,), jnp.float32))
        sol = odeint_rk45(
            ode_func,
            init,
            self.eps,
            self.sde.T,
            rtol=self.rtol,
            atol=self.atol,
            max_steps=self.max_steps,
        )
        # Solver exhaustion would silently corrupt bits/dim — NaN-poison instead.
        z, delta_logp = poison_on_failure(sol, sol.y, "likelihood estimation")
        prior_logp = self.sde.prior_logp(z)
        N = np.prod(shape[1:])
        bpd = -(prior_logp + delta_logp) / np.log(2)
        bpd = bpd / N
        # +7 = ln(128)/ln(2): data scaled to [-1, 1] from [0, 256]
        # (reference likelihood.py:96-102).
        offset = 7.0
        bpd = bpd + offset
        return bpd, z, sol.nfev
