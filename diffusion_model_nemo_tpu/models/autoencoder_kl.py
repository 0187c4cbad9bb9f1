"""Trainable KL-autoencoder model: the first stage of latent diffusion.

Beyond the reference's model surface (all families in
diffusion_model_nemo/models/ diffuse in pixel space): this trains the
:class:`~..modules.autoencoder.AutoencoderKL` VAE (Rombach et al. 2022) with
the LDM objective — per-sample reconstruction loss + ``kl_weight``-scaled
posterior KL — then :class:`LatentDiffusion` freezes it and runs any
DDPM-family process in its latent space.

Framework integration mirrors the pixel families: pure
``training_step(params, batch, key, step)`` the Trainer jits over the mesh,
``save_to``/``restore_from`` ``.dmn`` archives, periodic image dumps (prior
decodes), and the same YAML/`_target_` config surface
(examples/configs/latent_diffusion/autoencoder_kl.yaml).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate, register_target
from ..data.hf_vision_data import preprocess_batch
from ..modules.autoencoder import diagonal_gaussian_kl, diagonal_gaussian_sample
from ..utils import logging
from .abstract_diffusion_model import AbstractDiffusionModel

__all__ = ["AutoencoderKLModel"]


@register_target(
    "diffusion_model_nemo.models.AutoencoderKLModel",
    "diffusion_model_nemo_tpu.models.AutoencoderKLModel",
)
class AutoencoderKLModel(AbstractDiffusionModel):
    """VAE trainer: ``loss = rec(x, x̂) + kl_weight · mean_B KL(q(z|x) ‖ N(0,I))``.

    ``cfg.diffusion_model`` names the :class:`AutoencoderKL` flax module (the
    slot keeps the config surface uniform with the diffusion families so the
    Trainer's precision/network plumbing applies unchanged). ``kl_weight``
    defaults to LDM's 1e-6 — the KL is per-sample SUMMED, so the tiny weight
    keeps the posterior close to deterministic while regularizing its scale.
    """

    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.diffusion_model = self.build_network()
        self.sampler = None  # no diffusion process; _jitted keys on version 0
        self.loss = instantiate(self.cfg.loss)
        self.kl_weight = float(self.cfg.get("kl_weight", 1.0e-6))

    # ---- plumbing --------------------------------------------------------------
    def init_params(self, key: Optional[jax.Array] = None) -> Any:
        """The AE takes only images (no timestep) — override the base init."""
        if key is None:
            key = jax.random.PRNGKey(int(self.cfg.get("seed", 0)))
        x = jnp.zeros(
            (1, int(self.image_size), int(self.image_size), int(self.channels)),
            jnp.float32,
        )
        variables = self.diffusion_model.init({"params": key}, x)
        self.params = variables["params"]
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        n = sum(int(p.size) for p in jax.tree.leaves(self.params))
        logging.info(f"Initialized AutoencoderKLModel with {n:,} parameters")
        return self.params

    @property
    def downsample_factor(self) -> int:
        return int(self.diffusion_model.downsample_factor)

    # ---- training --------------------------------------------------------------
    def training_step(self, params, batch, key, step):
        k_pre, k_post, k_drop = jax.random.split(key, 3)
        proc = preprocess_batch(batch, k_pre, train=True)
        x = proc["pixel_values"]  # [-1, 1]

        rngs = None
        deterministic = True
        if self.diffusion_model.dropout:
            rngs, deterministic = {"dropout": k_drop}, False
        rec, mean, logvar = self.diffusion_model.apply(
            {"params": params}, x, k_post, deterministic=deterministic, rngs=rngs
        )
        rec_loss = self.loss(input=rec, target=x)
        kl = diagonal_gaussian_kl(mean, logvar).mean()
        loss = rec_loss + self.kl_weight * kl
        metrics = {"train_loss": loss, "rec_loss": rec_loss, "kl": kl}
        return loss, metrics

    # ---- evaluation ------------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        """Mode reconstruction quality on held-out data: MSE + PSNR (display
        space, peak 1.0) + the posterior KL."""
        proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
        x = proc["pixel_values"]

        def build():
            def fn(params, x):
                rec, mean, logvar = self.diffusion_model.apply({"params": params}, x, None)
                mse01 = jnp.mean(jnp.square((rec - x) * 0.5))  # [-1,1] → [0,1] scale
                return {
                    "sum_mse": mse01 * x.shape[0],
                    "sum_kl": diagonal_gaussian_kl(mean, logvar).sum(),
                }

            return jax.jit(fn)

        out = self._jitted("test_step", build, x.shape)(self.params, x)
        out = {k: v for k, v in out.items()}
        out["num_samples"] = jnp.asarray(x.shape[0], jnp.int32)
        return out

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        mse = float(sum(np.asarray(o["sum_mse"]) for o in outputs)) / total
        result = {
            "test_rec_mse": mse,
            "test_rec_psnr": float(-10.0 * np.log10(max(mse, 1e-12))),
            "test_kl": float(sum(np.asarray(o["sum_kl"]) for o in outputs)) / total,
        }
        logging.info(f"Autoencoder test: {result}")
        return result

    # ---- inference services ------------------------------------------------------
    def encode(self, x: jnp.ndarray, key: Optional[jax.Array] = None, use_ema: bool = False):
        """Images [B,H,W,C] in [-1,1] → latent draw (or mode when ``key=None``)."""
        params = self.ema_params if use_ema else self.params

        def build():
            def fn(params, x, key):
                mean, logvar = self.diffusion_model.apply(
                    {"params": params}, x, method="encode"
                )
                return diagonal_gaussian_sample(mean, logvar, key)

            def fn_mode(params, x):
                mean, _ = self.diffusion_model.apply({"params": params}, x, method="encode")
                return mean

            return jax.jit(fn_mode) if key is None else jax.jit(fn)

        f = self._jitted("encode", build, x.shape, key is None)
        return f(params, x) if key is None else f(params, x, key)

    def decode(self, z: jnp.ndarray, use_ema: bool = False) -> jnp.ndarray:
        """Latents → images in [-1, 1]."""
        params = self.ema_params if use_ema else self.params

        def build():
            return jax.jit(
                lambda params, z: self.diffusion_model.apply(
                    {"params": params}, z, method="decode"
                )
            )

        return self._jitted("decode", build, z.shape)(params, z)

    def reconstruct(self, x01: jnp.ndarray, use_ema: bool = False) -> jnp.ndarray:
        """[0,1] images → mode reconstruction in [0,1] (round-trip service)."""
        rec = self.decode(self.encode(x01 * 2.0 - 1.0, use_ema=use_ema), use_ema=use_ema)
        return jnp.clip((rec + 1.0) * 0.5, 0.0, 1.0)

    def sample(self, batch_size: int, image_size: int, key=None, use_ema: bool = False, **_):
        """Decode prior draws z ~ N(0, I) → [B,H,W,C] in [0,1]. A KL-weighted
        AE is not a generative prior match (that's the latent DDPM's job) —
        this exists for the periodic training dumps and API uniformity."""
        key = key if key is not None else jax.random.PRNGKey(0)
        f = int(self.downsample_factor)
        z = jax.random.normal(
            key,
            (batch_size, int(image_size) // f, int(image_size) // f,
             int(self.diffusion_model.z_channels)),
            jnp.float32,
        )
        rec = self.decode(z, use_ema=use_ema)
        return jnp.clip((rec + 1.0) * 0.5, 0.0, 1.0)

    def interpolate(self, x1, x2, t=None, lambd: float = 0.5, **_):
        """Latent-space lerp between two [0,1] image batches → [0,1] decode."""
        z1 = self.encode(x1 * 2.0 - 1.0)
        z2 = self.encode(x2 * 2.0 - 1.0)
        rec = self.decode((1.0 - float(lambd)) * z1 + float(lambd) * z2)
        return jnp.clip((rec + 1.0) * 0.5, 0.0, 1.0)
