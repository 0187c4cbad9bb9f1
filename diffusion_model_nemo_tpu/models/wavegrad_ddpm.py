"""WaveGrad-style DDPM: continuous-noise-level training + fast re-scheduling.

Parity with the reference WavegradDDPM
(diffusion_model_nemo/models/wavegrad_ddpm.py): asserts a WaveGradDiffusion
sampler; training samples a continuous √ᾱ level and conditions the FiLM
U-Net on it; periodic eval searches a 50-step schedule, samples, then
restores the long training schedule.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config.registry import register_target
from ..data.hf_vision_data import preprocess_batch
from ..modules.wavegrad_diffusion import WaveGradDiffusion
from .ddpm import DDPM

__all__ = ["WavegradDDPM"]


@register_target("diffusion_model_nemo.models.WavegradDDPM")
class WavegradDDPM(DDPM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        assert isinstance(
            self.sampler, WaveGradDiffusion
        ), "This class must implement WaveGradDiffusion as its sampler"

    def _example_time(self) -> jnp.ndarray:
        # The FiLM net conditions on a [B, 1, 1, 1] noise level.
        return jnp.full((1, 1, 1, 1), 0.5, jnp.float32)

    def training_step(self, params, batch, key, step):
        """Continuous noise-level training (reference wavegrad_ddpm.py:43-66);
        the level is drawn with jax.random inside the jitted step (the
        reference uses host numpy RNG)."""
        k_pre, k_level, k_noise, k_drop = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        level = self.sampler.sample_continuous_noise_level(B, k_level)
        noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
        x_t = self.sampler.q_sample_continuous(samples, level, noise)

        model_output = self.model_fn(params, x_t, level, dropout_rng=k_drop)
        loss = self.loss(input=model_output, target=noise)
        return loss, {"train_loss": loss}

    def _save_image_step(self, batch_size: int, step: int, key=None):
        """Fast eval: search a 50-step schedule, sample, restore
        (reference wavegrad_ddpm.py:67-90). Returns the sampled images so
        the Trainer's TB/wandb image hook fires for WaveGrad runs too."""
        self.sampler.search_noise_schedule_coefficients(timesteps=50, iters=100, seed=0, verbose=False)
        self.sampler.change_noise_schedule(verbose=False)
        self.sampler.compute_constants(timesteps=50)
        self._jit_cache.clear()
        try:
            return super()._save_image_step(batch_size, step, key=key)
        finally:
            self.sampler.change_noise_schedule(reset_cfg=True, verbose=False)
            self.sampler.compute_constants(timesteps=self.sampler.original_timesteps)
            self._jit_cache.clear()

    def interpolate(self, x1, x2, t=None, lambd=0.5, **kwargs):
        raise NotImplementedError()
