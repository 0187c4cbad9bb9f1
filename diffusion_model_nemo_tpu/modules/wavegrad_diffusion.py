"""WaveGrad-style continuous-noise-level diffusion + re-schedulable sampling.

Behavioral parity with the reference's WaveGradDiffusion
(diffusion_model_nemo/modules/wavegrad_diffusion.py): training conditions the
network on a continuous √ᾱ noise level rather than an integer t; at eval time
a short (e.g. 50-step) schedule is searched so its final √ᾱ matches the long
training schedule, then the inherited ancestral scan runs at the short length.

TPU-native changes: the continuous level is sampled with ``jax.random`` inside
the jitted train step (the reference uses host numpy RNG per batch,
wavegrad_diffusion.py:119-129); the beta-end random search stays host-side
(it is schedule construction, not hot-path).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from ..ops.schedules import compute_schedule_constants, extract
from ..utils import logging
from .diffusion_process import ModelFn
from .gaussian_diffusion import GaussianDiffusion, PMeanVariance

__all__ = ["WaveGradDiffusion"]


@register_target("diffusion_model_nemo.modules.WaveGradDiffusion")
class WaveGradDiffusion(GaussianDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
        class_conditional: bool = False,
    ):
        if objective == "pred_v":
            # WaveGrad conditions on a CONTINUOUS noise level sampled between
            # schedule entries (sample_continuous_noise_level) — the discrete
            # v_target/predict_start_from_v tables do not apply.
            raise ValueError("WaveGradDiffusion supports pred_noise|pred_x0 only")
        super().__init__(
            timesteps=timesteps,
            schedule_name=schedule_name,
            schedule_cfg=schedule_cfg,
            objective=objective,
            class_conditional=class_conditional,
        )
        self.original_timesteps = timesteps
        self.original_schedule_name = schedule_name
        self.original_schedule_cfg = copy.deepcopy(self.schedule_cfg)

    # ---- schedule hot-swap -----------------------------------------------------
    def change_noise_schedule(
        self,
        schedule_name: Optional[str] = None,
        schedule_cfg: Optional[dict] = None,
        reset_cfg: bool = False,
        verbose: bool = True,
    ) -> None:
        """Swap the schedule config (reference wavegrad_diffusion.py:35-54);
        call ``compute_constants`` afterwards to take effect."""
        if reset_cfg:
            self.schedule_name = self.original_schedule_name
            self.schedule_cfg = copy.deepcopy(self.original_schedule_cfg)
        if schedule_name is not None:
            self.schedule_name = schedule_name
        if schedule_cfg is not None:
            self.schedule_cfg = schedule_cfg
        if verbose:
            logging.info(f"New scheduler name : {self.schedule_name}")
            logging.info(f"New scheduler config : {self.schedule_cfg}")

    def search_noise_schedule_coefficients(
        self,
        timesteps: int,
        iters: int = 100,
        seed: Optional[int] = None,
        verbose: bool = True,
    ) -> None:
        """Random search over the schedule's beta-end so the short schedule's
        final √ᾱ matches the long one (reference wavegrad_diffusion.py:56-99).
        Pure host-side numpy — this builds constants, it is not hot-path."""
        self.compute_constants(self.original_timesteps)
        target = float(np.asarray(self.constants.sqrt_alphas_cumprod_prev)[-1])

        if self.schedule_name == "cosine":
            beta_end_key = "max_clip"
        elif self.schedule_name in ("linear", "quadratic", "sigmoid"):
            beta_end_key = "beta_end"
        else:
            raise ValueError("Unknown schedule name !")

        sched = self.schedule_cfg.setdefault(self.schedule_name, {})
        best_beta_end = sched.get(beta_end_key, 0.02)
        best_mae = 1e10
        rng = np.random.RandomState(seed)

        for _ in range(iters):
            sampled_beta_end = float(rng.uniform(0.0, 1.0))
            sched[beta_end_key] = sampled_beta_end
            consts = compute_schedule_constants(timesteps, self.schedule_name, self.schedule_cfg)
            new_last = float(np.asarray(consts.sqrt_alphas_cumprod_prev)[-1])
            mae = abs(target - new_last)
            if mae < best_mae:
                if verbose:
                    logging.info(
                        f"Searching coefficient: found beta2={sampled_beta_end} "
                        f"(error: {mae} < {best_mae})"
                    )
                best_mae = mae
                best_beta_end = sampled_beta_end

        sched[beta_end_key] = best_beta_end
        if verbose:
            logging.info(f"Searching coefficient: final beta2 = {best_beta_end}")

    # ---- continuous noise level --------------------------------------------------
    def sample_continuous_noise_level(self, batch_size: int, key: jax.Array) -> jnp.ndarray:
        """√ᾱ sampled uniformly between adjacent schedule points
        (reference wavegrad_diffusion.py:119-129), fully on device."""
        k1, k2 = jax.random.split(key)
        s = jax.random.randint(k1, (batch_size,), 1, self.timesteps + 1)
        lo = self.constants.sqrt_alphas_cumprod_prev[s - 1]
        hi = self.constants.sqrt_alphas_cumprod_prev[s]
        u = jax.random.uniform(k2, (batch_size,), dtype=jnp.float32)
        level = lo + u * (hi - lo)
        return level.reshape(-1, 1, 1, 1)

    def q_sample_continuous(
        self,
        x_start: jnp.ndarray,
        continuous_sqrt_alpha_cumprod: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Forward noising keyed on continuous √ᾱ
        (reference wavegrad_diffusion.py:131-148)."""
        level = continuous_sqrt_alpha_cumprod
        return level * x_start + jnp.sqrt(1.0 - level**2) * noise

    # Reference API alias: q_sample(x_start, continuous_sqrt_alpha_cumprod, noise)
    def q_sample(self, x_start, t_or_level, noise):
        if jnp.issubdtype(jnp.asarray(t_or_level).dtype, jnp.integer):
            return super().q_sample(x_start, t_or_level, noise)
        return self.q_sample_continuous(x_start, t_or_level, noise)

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        """Uses sqrt_alphas_cumprod_m1 (reference wavegrad_diffusion.py:150-158)."""
        c = self.constants
        return (
            extract(c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(c.sqrt_alphas_cumprod_m1, t, noise.ndim) * noise
        )

    def p_mean_variance(
        self,
        model_fn: Optional[ModelFn],
        params: Any,
        x: jnp.ndarray,
        t: jnp.ndarray,
        model_output: Optional[jnp.ndarray] = None,
        noise_level: Optional[jnp.ndarray] = None,
        net_shape: Optional[Tuple[int, ...]] = None,
    ) -> PMeanVariance:
        """Conditions the network on noise level √ᾱ_{t+1} instead of t
        (reference wavegrad_diffusion.py:160-189). ``net_shape`` supports the
        flat-carry sampling scan (see GaussianDiffusion.p_mean_variance): the
        FiLM conditioning rank follows the NETWORK input rank, not the
        (possibly flattened) carry rank."""
        net_ndim = len(net_shape) if net_shape is not None else x.ndim
        if noise_level is None:
            t_arr = jnp.asarray(t)
            noise_level = extract(
                self.constants.sqrt_alphas_cumprod_prev, t_arr + 1, net_ndim
            )
            if t_arr.ndim == 0:
                # scalar-t fast path: broadcast the level over the batch for
                # the FiLM network's [B, 1, ...] conditioning input (rank
                # follows the data: images [B,1,1,1], waveforms [B,1,1])
                noise_level = jnp.broadcast_to(
                    noise_level, (x.shape[0],) + (1,) * (net_ndim - 1)
                )
        if model_output is None:
            x_net = x.reshape(net_shape) if net_shape is not None else x
            model_output = model_fn(params, x_net, noise_level)
        if model_output.shape != x.shape:
            model_output = model_output.reshape(x.shape)

        if self.objective == "pred_noise":
            x_recon = self.predict_start_from_noise(x_t=x, t=t, noise=model_output)
        else:
            x_recon = model_output
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
        model_mean, posterior_log_variance = self.q_posterior(x_start=x_recon, x=x, t=t)
        return PMeanVariance(model_mean, None, posterior_log_variance, x_recon)
