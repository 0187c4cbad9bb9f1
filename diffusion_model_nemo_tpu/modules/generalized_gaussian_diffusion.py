"""Generalized (DDIM) sampler — Song et al. 2020, eq. 12.

Behavioral parity with the reference's GeneralizedGaussianDiffusion
(diffusion_model_nemo/modules/generalized_gaussian_diffusion.py):
``eta ∈ [0, 1]`` (0 = DDIM, 1 = DDPM), ``ddim_timesteps`` strided subsampling,
extended ᾱ table with a prepended 1.0 so ``t = -1`` maps to ᾱ = 1. The strided
(t, t_next) pairs are precomputed as index vectors and the whole fast-sampling
loop is one ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from ..ops.schedules import extract
from .diffusion_process import ModelFn, _scan_unroll
from .gaussian_diffusion import GaussianDiffusion, PMeanVariance, batched_t

__all__ = ["GeneralizedGaussianDiffusion"]


@register_target("diffusion_model_nemo.modules.GeneralizedGaussianDiffusion")
class GeneralizedGaussianDiffusion(GaussianDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
        eta: float = 0.0,
        ddim_timesteps: int = -1,
        class_conditional: bool = False,
        zero_terminal_snr: bool = False,
    ):
        super().__init__(
            timesteps=timesteps,
            schedule_name=schedule_name,
            schedule_cfg=schedule_cfg,
            objective=objective,
            class_conditional=class_conditional,
            zero_terminal_snr=zero_terminal_snr,
        )
        if not (0.0 <= eta <= 1.0):
            raise ValueError("`eta` must be a value in [0, 1]. 0 = DDIM and 1 = DDPM mode")
        self.eta = float(eta)
        self.ddim_timesteps = int(ddim_timesteps) if ddim_timesteps > 0 else self.timesteps

    def compute_constants(self, timesteps: int) -> None:
        super().compute_constants(timesteps)
        # ᾱ extended with a prepended step so t=-1 → ᾱ=1
        # (reference generalized_gaussian_diffusion.py:106-108).
        self.alphas_extended_cumprod = jnp.concatenate(
            [jnp.ones((1,), jnp.float32), self.constants.alphas_cumprod]
        )

    def generalized_predict_start_from_noise(self, x_t, t, noise):
        acp = extract(self.alphas_extended_cumprod, t + 1, x_t.ndim)
        return (x_t - noise * jnp.sqrt(1.0 - acp)) / jnp.sqrt(acp)

    def generalized_predict_start_from_v(self, x_t, t, v):
        """x̂₀ from a v-prediction on the extended-ᾱ grid (t=-1 → ᾱ=1)."""
        acp = extract(self.alphas_extended_cumprod, t + 1, x_t.ndim)
        return jnp.sqrt(acp) * x_t - jnp.sqrt(1.0 - acp) * v

    def generalized_predict_noise_from_v(self, x_t, t, v):
        """ε̂ from a v-prediction on the extended-ᾱ grid."""
        acp = extract(self.alphas_extended_cumprod, t + 1, x_t.ndim)
        return jnp.sqrt(1.0 - acp) * x_t + jnp.sqrt(acp) * v

    def p_mean_variance(
        self,
        model_fn: Optional[ModelFn],
        params: Any,
        x: jnp.ndarray,
        t: jnp.ndarray,
        model_output: Optional[jnp.ndarray] = None,
        net_shape: Optional[Tuple[int, ...]] = None,
    ) -> PMeanVariance:
        if model_output is None:
            x_net = x.reshape(net_shape) if net_shape is not None else x
            model_output = model_fn(params, x_net, batched_t(t, x))
        if model_output.shape != x.shape:
            model_output = model_output.reshape(x.shape)
        if self.objective == "pred_noise":
            x_recon = self.generalized_predict_start_from_noise(x_t=x, t=t, noise=model_output)
        elif self.objective == "pred_v":
            x_recon = self.generalized_predict_start_from_v(x_t=x, t=t, v=model_output)
        else:
            x_recon = model_output
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
        model_mean, posterior_log_variance = self.q_posterior(x_start=x_recon, x=x, t=t)
        return PMeanVariance(model_mean, None, posterior_log_variance, x_recon)

    def ddim_step(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jnp.ndarray,
        t: jnp.ndarray,
        t_next: jnp.ndarray,
        key: jax.Array,
        net_shape: Optional[Tuple[int, ...]] = None,
    ):
        """One generalized step x_t → x_{t_next}
        (reference generalized_gaussian_diffusion.py:74-95)."""
        x_net = x.reshape(net_shape) if net_shape is not None else x
        model_output = model_fn(params, x_net, batched_t(t, x))
        if model_output.shape != x.shape:
            model_output = model_output.reshape(x.shape)
        out = self.p_mean_variance(model_fn, params, x, t, model_output=model_output)
        x0_t = out.pred_x_start

        acp = extract(self.alphas_extended_cumprod, t + 1, x.ndim)
        acp_next = extract(self.alphas_extended_cumprod, t_next + 1, x.ndim)

        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        c1 = self.eta * jnp.sqrt((1.0 - acp / acp_next) * (1.0 - acp_next) / (1.0 - acp))
        c2 = jnp.sqrt((1.0 - acp_next) - c1**2)
        # The c2 "direction" term wants ε̂: for pred_noise that IS the model
        # output (reference behavior, generalized_gaussian_diffusion.py:74-95);
        # for pred_v convert the v-prediction exactly.
        if self.objective == "pred_v":
            eps_hat = jnp.sqrt(1.0 - acp) * x + jnp.sqrt(acp) * model_output
        else:
            eps_hat = model_output
        xt_next = jnp.sqrt(acp_next) * x0_t + c1 * noise + c2 * eps_hat
        return xt_next, x0_t

    def _strided_sequences(self) -> Tuple[np.ndarray, np.ndarray]:
        """Descending (t, t_next) pairs; reference
        generalized_gaussian_diffusion.py:110-112."""
        stride = self.timesteps // self.ddim_timesteps
        if stride < 1:
            raise ValueError(
                f"ddim_timesteps={self.ddim_timesteps} exceeds the model's "
                f"{self.timesteps}-step training schedule; choose "
                f"ddim_timesteps <= timesteps (the reference crashes with a "
                f"bare zero-stride range() here)"
            )
        sequence = list(range(0, self.timesteps, stride))
        sequence_next = [-1] + sequence[:-1]
        return (
            np.asarray(sequence[::-1], dtype=np.int32),
            np.asarray(sequence_next[::-1], dtype=np.int32),
        )

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
        del num_steps  # DDIM stride is controlled by ddim_timesteps
        B = shape[0]
        seq, seq_next = self._strided_sequences()
        ts = jnp.asarray(seq)
        ts_next = jnp.asarray(seq_next)

        key, init_key = jax.random.split(key)
        if img is None:
            img = jax.random.normal(init_key, shape, dtype=jnp.float32)

        # Flat [B, H·W·C] carry for full-lane elementwise math — see
        # GaussianDiffusion.p_sample_loop (bitwise identical).
        def step(carry, tt):
            x, k = carry
            t, t_next = tt
            k, sub = jax.random.split(k)
            # scalar (t, t_next): table lookups are dynamic-slices
            x, _ = self.ddim_step(model_fn, params, x, t, t_next, sub, net_shape=shape)
            y = (x + 1.0) * 0.5 if return_frames else None
            return (x, k), y

        (flat, _), frames = jax.lax.scan(
            step, (img.reshape(B, -1), key), (ts, ts_next), unroll=_scan_unroll()
        )
        img = flat.reshape(shape)
        out = (img + 1.0) * 0.5 if unnormalize else img
        if return_frames:
            return out, frames.reshape((len(seq),) + tuple(shape))
        return out

    def interpolate(
        self,
        model_fn: ModelFn,
        params: Any,
        x1: jnp.ndarray,
        x2: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
        t: Optional[int] = None,
        lambd: float = 0.5,
        return_frames: bool = False,
    ):
        """DDIM interpolation runs the strided loop from a given latent
        (reference generalized_gaussian_diffusion.py:138-140); slerp of the
        latents is done by the caller (examples/ddpm/interpolate_ddim.py)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self.p_sample_loop(
            model_fn, params, x1.shape, key, img=x1, return_frames=return_frames
        )
