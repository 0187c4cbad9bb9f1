"""Spherical interpolation of DDIM latents, denoised with the strided sampler
(counterpart of reference examples/ddpm/interpolate_ddim.py:56-88)."""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid


@dataclass
class InterpolateDDIMConfig:
    model_path: str = "DDPM.dmn"
    num_interpolations: int = 8  # points along the slerp path
    ddim_eta: float = 0.0
    ddim_timesteps: int = 50
    image_size: int = -1
    output_dir: str = "interpolations_ddim"
    seed: int = 0
    use_ema: bool = True


def slerp(z1, z2, alpha):
    theta = jnp.arccos(
        jnp.clip(jnp.sum(z1 * z2) / (jnp.linalg.norm(z1) * jnp.linalg.norm(z2)), -1 + 1e-7, 1 - 1e-7)
    )
    return (
        jnp.sin((1 - alpha) * theta) / jnp.sin(theta) * z1
        + jnp.sin(alpha * theta) / jnp.sin(theta) * z2
    )


@hydra_runner(config_path=None, config_name="InterpolateDDIMConfig", schema=InterpolateDDIMConfig)
def main(cfg):
    cfg = InterpolateDDIMConfig(**cfg)
    model = DDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)

    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
    sampler_cfg["eta"] = cfg.ddim_eta
    sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
    model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    shape = (image_size, image_size, int(model.channels))
    k1, k2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    z1 = jax.random.normal(k1, shape)
    z2 = jax.random.normal(k2, shape)

    alphas = jnp.linspace(0.0, 1.0, cfg.num_interpolations)
    latents = jnp.stack([slerp(z1, z2, a) for a in alphas])

    model_fn = model.get_model_fn()
    imgs = jax.jit(
        lambda p, x: model.sampler.p_sample_loop(model_fn, p, latents.shape, jax.random.PRNGKey(0), img=x)
    )(model.params, latents)

    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_image_grid(np.asarray(imgs), str(out_dir / "slerp.png"), nrow=cfg.num_interpolations)
    logging.info(f"Saved DDIM slerp to {out_dir}")


if __name__ == "__main__":
    main()
