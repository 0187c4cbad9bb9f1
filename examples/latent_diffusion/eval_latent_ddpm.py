"""Sample from a trained LatentDiffusion archive (self-contained: the frozen
first stage travels inside the .dmn), optionally via the DDIM / DPM-Solver++
fast samplers — the latent chain swaps samplers exactly like the pixel
families (counterpart of examples/ddpm/eval_ddpm.py).

python eval_latent_ddpm.py model_path=LatentDDPM.dmn batch_size=16 \
    use_ddim_sampler=true ddim_timesteps=50
"""

import dataclasses
import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import LatentDiffusion
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class EvalConfig:
    model_path: str = "LatentDDPM.dmn"
    batch_size: int = 32
    image_size: int = -1

    # DDIM
    use_ddim_sampler: bool = True
    ddim_eta: float = 0.0
    ddim_timesteps: int = 50  # -1 uses original timesteps

    # DPM-Solver++ (overrides DDIM when set)
    use_dpm_solver: bool = False
    dpm_steps: int = 20
    dpm_order: int = 2
    dpm_time_spacing: str = "strided"

    # Output
    output_dir: str = "samples"
    add_timestamp: bool = True
    grid_plot: bool = True

    seed: Optional[int] = None
    use_ema: bool = True


def maybe_swap_sampler(model: LatentDiffusion, cfg: EvalConfig) -> None:
    if cfg.use_dpm_solver:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.DPMSolverDiffusion"
        sampler_cfg["solver_steps"] = cfg.dpm_steps
        sampler_cfg["solver_order"] = cfg.dpm_order
        sampler_cfg["time_spacing"] = cfg.dpm_time_spacing
        model.change_sampler(sampler_cfg)
    elif cfg.use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = cfg.ddim_eta
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    logging.info(f"Eval config: {dataclasses.asdict(cfg)}")

    model = LatentDiffusion.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    maybe_swap_sampler(model, cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    seed = cfg.seed if cfg.seed is not None else 0
    key = jax.random.PRNGKey(int(seed))

    imgs = model.sample(batch_size=cfg.batch_size, image_size=image_size, key=key)
    imgs = np.asarray(imgs)

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    if cfg.grid_plot:
        save_image_grid(imgs, str(out_dir / "samples_grid.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(imgs)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"sample_{i}.png"
        )
    logging.info(f"Saved {imgs.shape[0]} samples to {out_dir}")


if __name__ == "__main__":
    main()
