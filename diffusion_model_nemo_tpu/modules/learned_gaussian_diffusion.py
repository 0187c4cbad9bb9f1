"""Improved-DDPM learned-variance process (Nichol & Dhariwal).

Numerics match the reference's LearnedGaussianDiffusion
(diffusion_model_nemo/modules/learned_gaussian_diffusion.py): the network
output is chunked into (ε̂, v) along channels, v mapped from [-1, 1] to [0, 1]
and used to interpolate ``log σ² = v·log β_t + (1-v)·log β̃_t``.

NHWC note: the chunk is over the **last** axis (channels-last on TPU), not
dim=1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ..config.registry import register_target
from ..ops.schedules import extract
from .diffusion_process import ModelFn
from .gaussian_diffusion import GaussianDiffusion, PMeanVariance, batched_t

__all__ = ["LearnedGaussianDiffusion"]


@register_target("diffusion_model_nemo.modules.LearnedGaussianDiffusion")
class LearnedGaussianDiffusion(GaussianDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
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

    def model_log_variance(self, model_output: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray):
        """Interpolated log-variance from the v half of the model output
        (reference learned_gaussian_diffusion.py:36-43). The (ε̂, v) chunk is
        a CHANNEL split, so it happens in the network's image shape; the
        result is then reshaped to x's shape (which the flat-carry sampling
        scan keeps as [B, H·W·C] — see GaussianDiffusion.p_mean_variance)."""
        _, var_interp_frac_unnormalized = jnp.split(model_output, 2, axis=-1)
        if var_interp_frac_unnormalized.shape != x.shape:
            var_interp_frac_unnormalized = var_interp_frac_unnormalized.reshape(x.shape)
        min_log = extract(self.constants.posterior_log_variance_clipped, t, x.ndim)
        max_log = extract(self.constants.log_betas, t, x.ndim)
        var_interp_frac = (var_interp_frac_unnormalized + 1.0) * 0.5
        return var_interp_frac * max_log + (1.0 - var_interp_frac) * min_log

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
        pred_noise, _ = jnp.split(model_output, 2, axis=-1)
        if pred_noise.shape != x.shape:
            pred_noise = pred_noise.reshape(x.shape)

        model_log_variance = self.model_log_variance(model_output, x, t)
        model_variance = jnp.exp(model_log_variance)

        # Under pred_v the first output half is a v-prediction, not ε̂
        # (the variance-interpolation half is parameterization-agnostic).
        if self.objective == "pred_v":
            x_start = self.predict_start_from_v(x_t=x, t=t, v=pred_noise)
        else:
            x_start = self.predict_start_from_noise(x_t=x, t=t, noise=pred_noise)
        x_start = jnp.clip(x_start, -1.0, 1.0)

        model_mean, _ = self.q_posterior(x_start, x, t)
        return PMeanVariance(model_mean, model_variance, model_log_variance, x_start)
