"""Cascaded generation: a base archive + a chain of SR3 upscaler archives
(Ho et al. 2022). Counterpart of eval_ddpm.py for multi-resolution synthesis:

    python cascade_sr3.py base_path=DDPM16.dmn upscaler_paths=SR3_32.dmn,SR3_64.dmn

The base may be any family the generic restore knows (DDPM/conditional/EDM/
rectified-flow/latent); sampler-swap flags apply to the BASE, while
``upscaler_ddim_timesteps=N`` swaps every upscaler to DDIM-N (the usual
cascade recipe: long chain at low res, short refinement chains above).
"""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.pipelines import CascadePipeline
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class CascadeConfig:
    base_path: str = "DDPM.dmn"
    upscaler_paths: str = ""  # comma-separated SR3 archives, low→high res
    batch_size: int = 8

    # conditional bases
    label: int = -1
    guidance_scale: float = 1.0

    # sampler swaps for the BASE (same flags as eval_ddpm.py)
    use_ddim_sampler: bool = False
    ddim_timesteps: int = 50
    eta: float = 0.0
    use_dpm_solver: bool = False
    dpm_steps: int = 20
    # DDIM-N for every upscaler stage (0 = keep each archive's sampler)
    upscaler_ddim_timesteps: int = 0

    output_dir: str = "cascade_samples"
    add_timestamp: bool = True
    save_stages: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


def _swap_to(model, target: str, **extra):
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = target
    sampler_cfg.update(extra)
    model.change_sampler(sampler_cfg)


@hydra_runner(config_path=None, config_name="CascadeConfig", schema=CascadeConfig)
def main(cfg):
    cfg = CascadeConfig(**cfg)
    paths = [p for p in cfg.upscaler_paths.split(",") if p.strip()]
    if not paths:
        raise ValueError("cascade_sr3 needs upscaler_paths=<sr3.dmn>[,<sr3.dmn>...]")
    pipe = CascadePipeline.from_archives(cfg.base_path, paths, use_ema=cfg.use_ema)

    if cfg.use_dpm_solver:
        _swap_to(pipe.base, "diffusion_model_nemo.modules.DPMSolverDiffusion",
                 solver_steps=cfg.dpm_steps)
    elif cfg.use_ddim_sampler:
        _swap_to(pipe.base, "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
                 eta=cfg.eta, ddim_timesteps=cfg.ddim_timesteps)
    if cfg.upscaler_ddim_timesteps > 0:
        for up in pipe.upscalers:
            _swap_to(up, "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
                     eta=0.0, ddim_timesteps=cfg.upscaler_ddim_timesteps)

    base_kwargs = {}
    if cfg.label >= 0:
        base_kwargs["label"] = cfg.label
        if cfg.guidance_scale != 1.0:
            base_kwargs["guidance_scale"] = cfg.guidance_scale

    seed = cfg.seed if cfg.seed is not None else 0
    stages = pipe.sample(
        cfg.batch_size,
        key=jax.random.PRNGKey(seed),
        use_ema=False,  # EMA/train weights already selected at restore time
        return_stages=True,
        **base_kwargs,
    )
    final = np.asarray(stages[-1])

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    if cfg.save_stages:
        for i, s in enumerate(stages):
            s = np.asarray(s)
            save_image_grid(s, str(out_dir / f"stage{i}_{s.shape[1]}px.png"), nrow=6)
    save_image_grid(final, str(out_dir / "samples_grid.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(final)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"sample_{i}.png"
        )
    logging.info(
        f"Saved {final.shape[0]} cascaded samples "
        f"({' → '.join(str(np.asarray(s).shape[1]) for s in stages)} px) to {out_dir}"
    )


if __name__ == "__main__":
    main()
