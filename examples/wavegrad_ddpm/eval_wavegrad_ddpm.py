"""Sample from a trained WavegradDDPM archive
(counterpart of reference examples/wavegrad_ddpm/eval_wavegrad_ddpm.py)."""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import WavegradDDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid


@dataclass
class EvalConfig:
    model_path: str = "WavegradDDPM.dmn"
    batch_size: int = 32
    image_size: int = -1
    sample_timesteps: int = 50
    search_iters: int = 1000

    output_dir: str = "samples"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = WavegradDDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    if cfg.sample_timesteps > 0:
        model.sampler.search_noise_schedule_coefficients(
            timesteps=cfg.sample_timesteps, iters=cfg.search_iters, seed=0, verbose=False)
        model.sampler.change_noise_schedule(verbose=False)
        model.sampler.compute_constants(cfg.sample_timesteps)
        model._jit_cache.clear()

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
