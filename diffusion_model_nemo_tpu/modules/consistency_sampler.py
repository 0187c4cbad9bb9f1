"""Consistency-model sampler — Song et al. 2023 (arXiv:2303.01469).

Beyond the reference's sampler surface: 1-to-few-step generation from a
consistency-distilled student (training/consistency.py). The network is read
through the consistency head

    f(x^, sigma) = c_skip(sigma) * x^  +  c_out(sigma) * F(a*x^, t(sigma))

with the paper's boundary-enforcing coefficients

    c_skip = sigma_data^2 / ((sigma - sigma_min)^2 + sigma_data^2)
    c_out  = sigma_data * (sigma - sigma_min) / sqrt(sigma_data^2 + sigma^2)

so f(x^, sigma_min) == x^ EXACTLY by construction (no trained boundary).
Coordinates are EDM's variance-exploding view of the discrete VP schedule
(see modules/karras_diffusion.py): x^ = x_t / sqrt(acp), sigma^ = s/a; the
network input scale is the VP alpha (c_in = a) and the conditioning time is
the log-sigma interpolation of the model's own table — identical to what the
teacher saw in training, so distillation starts from matched activations.

Multistep sampling (Algorithm 1): evaluate f at sigma_max, then for each
further level sigma_k re-noise x = x0 + sqrt(sigma_k^2 - sigma_min^2) * z and
evaluate again. NFE == sample_steps (1 by default). The loop is a tiny
trace-unrolled Python loop — at 1-8 steps a scan buys nothing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from .diffusion_process import ModelFn
from .gaussian_diffusion import batched_t
from .karras_diffusion import KarrasDiffusion

__all__ = ["ConsistencySampler"]


@register_target(
    "diffusion_model_nemo.modules.ConsistencySampler",
    "diffusion_model_nemo_tpu.modules.ConsistencySampler",
)
class ConsistencySampler(KarrasDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
        sample_steps: int = 1,
        sigma_data: float = 0.5,
        rho: float = 7.0,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        clip_denoised: bool = True,
        class_conditional: bool = False,
    ):
        # solver_steps only seeds the parent's grid helpers; the sampler's own
        # eval levels come from _consistency_sigmas below.
        super().__init__(
            timesteps=timesteps,
            schedule_name=schedule_name,
            schedule_cfg=schedule_cfg,
            objective=objective,
            solver_steps=max(int(sample_steps) + 1, 2),
            solver_order=1,
            grid="karras",
            rho=rho,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            clip_denoised=clip_denoised,
            class_conditional=class_conditional,
        )
        if sample_steps < 1:
            raise ValueError(f"sample_steps must be >= 1, got {sample_steps}")
        self.sample_steps = int(sample_steps)
        self.sigma_data = float(sigma_data)

    # ---- head ------------------------------------------------------------------
    def _consistency_sigmas(self) -> Tuple[np.ndarray, np.ndarray]:
        """[K] descending eval sigmas (sigma_max first, sigma_min excluded)
        + their conditioning times. K == sample_steps."""
        sig, t_cond = self._sigma_grid()  # [K+2] incl. sigma_min and 0
        return sig[: self.sample_steps], t_cond[: self.sample_steps]

    def _sigma_floor(self) -> float:
        sig, _ = self._sigma_grid()
        return float(sig[-2])  # sigma_min (boundary level)

    def consistency_fn(
        self,
        model_fn: ModelFn,
        params: Any,
        xhat: jnp.ndarray,
        sigma,
        t,
        net_shape: Optional[Tuple[int, ...]] = None,
    ) -> jnp.ndarray:
        """f(x^, sigma): the consistency head over the raw network.

        ``sigma``/``t`` may be python/0-d scalars (sampling) or [B]-broadcast
        columns (the distiller's per-sample levels)."""
        sigma = jnp.asarray(sigma, jnp.float32)
        smin = self._sigma_floor()
        sd = self.sigma_data
        c_skip = sd**2 / ((sigma - smin) ** 2 + sd**2)
        c_out = sd * (sigma - smin) / jnp.sqrt(sd**2 + sigma**2)
        a = 1.0 / jnp.sqrt(1.0 + sigma * sigma)  # VP input scale (c_in)
        x_net = (a * xhat).reshape(net_shape) if net_shape is not None else a * xhat
        out = model_fn(params, x_net, batched_t(t, x_net))
        if out.shape[-1] != x_net.shape[-1]:  # learned-variance nets emit 2C
            out, _ = jnp.split(out, 2, axis=-1)
        out = out.reshape(xhat.shape)
        f = c_skip * xhat + c_out * out
        if self.clip_denoised:
            f = jnp.clip(f, -1.0, 1.0)
        return f

    # ---- sampling ----------------------------------------------------------------
    def p_sample_loop(
        self,
        model_fn: ModelFn,
        params: Any,
        shape: Tuple[int, ...],
        key: jax.Array,
        img: Optional[jnp.ndarray] = None,
        num_steps: Optional[int] = None,
        return_frames: bool = False,
        unnormalize: bool = True,
    ):
        del num_steps  # level count is the sampler's sample_steps
        B = shape[0]
        sig, t_cond = self._consistency_sigmas()
        smin = self._sigma_floor()

        key, init_key = jax.random.split(key)
        if img is None:
            img = jax.random.normal(init_key, shape, dtype=jnp.float32) * float(sig[0])

        x = img.reshape(B, -1)
        frames = []
        x0 = self.consistency_fn(
            model_fn, params, x, float(sig[0]), float(t_cond[0]), net_shape=shape
        )
        if return_frames:
            frames.append((x0 + 1.0) * 0.5)
        for k in range(1, self.sample_steps):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, x0.shape, dtype=x0.dtype)
            level = float(np.sqrt(max(sig[k] ** 2 - smin**2, 0.0)))
            x0 = self.consistency_fn(
                model_fn,
                params,
                x0 + level * z,
                float(sig[k]),
                float(t_cond[k]),
                net_shape=shape,
            )
            if return_frames:
                frames.append((x0 + 1.0) * 0.5)

        img = x0.reshape(shape)
        out = (img + 1.0) * 0.5 if unnormalize else img
        if return_frames:
            stacked = jnp.stack(frames).reshape((len(frames),) + tuple(shape))
            return out, stacked
        return out
