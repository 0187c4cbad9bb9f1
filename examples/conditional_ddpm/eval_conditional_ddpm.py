"""Class-conditional sampling from a trained ConditionalDDPM archive
(counterpart of reference examples/conditional_ddpm/eval_conditional_ddpm.py)."""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import ConditionalDDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid


@dataclass
class EvalConfig:
    model_path: str = "ConditionalDDPM.dmn"
    batch_size: int = 32
    image_size: int = -1
    label: Optional[int] = None  # None = unconditional (null class)
    # Classifier-free guidance weight (needs label): 1 ≈ conditional,
    # >1 sharpens class adherence. None = plain conditional sampling.
    guidance_scale: Optional[float] = None

    use_ddim_sampler: bool = True
    ddim_eta: float = 0.0
    ddim_timesteps: int = 10

    output_dir: str = "samples"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = ConditionalDDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)

    if cfg.use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = cfg.ddim_eta
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    imgs = model.sample(
        batch_size=cfg.batch_size,
        image_size=image_size,
        key=jax.random.PRNGKey(cfg.seed or 0),
        label=cfg.label,
        guidance_scale=cfg.guidance_scale,
    )

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = "uncond" if cfg.label is None else f"class{cfg.label}"
    save_image_grid(np.asarray(imgs), str(out_dir / f"samples_{tag}.png"), nrow=6)
    logging.info(f"Saved samples ({tag}) to {out_dir}")


if __name__ == "__main__":
    main()
