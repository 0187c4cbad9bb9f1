"""Sample from a trained ImprovedDDPM archive
(counterpart of reference examples/improved_ddpm/eval_ddpm.py)."""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import ImprovedDDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid


@dataclass
class EvalConfig:
    model_path: str = "ImprovedDDPM.dmn"
    batch_size: int = 32
    image_size: int = -1
    use_ddim_sampler: bool = False
    ddim_eta: float = 0.0
    ddim_timesteps: int = 50

    output_dir: str = "samples"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = ImprovedDDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    if cfg.use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = cfg.ddim_eta
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    imgs = model.sample(
        batch_size=cfg.batch_size, image_size=image_size,
        key=jax.random.PRNGKey(cfg.seed or 0),
    )

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)
    save_image_grid(np.asarray(imgs), str(out_dir / "samples_grid.png"), nrow=6)
    logging.info(f"Saved {np.asarray(imgs).shape[0]} samples to {out_dir}")


if __name__ == "__main__":
    main()
