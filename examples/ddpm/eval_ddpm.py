"""Sample from a trained DDPM archive, optionally via the DDIM fast sampler
(counterpart of reference examples/ddpm/eval_ddpm.py)."""

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

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_animation, save_image_grid, to_uint8


@dataclass
class EvalConfig:
    model_path: str = "DDPM.dmn"
    batch_size: int = 32
    image_size: int = -1

    # DDIM
    use_ddim_sampler: bool = True
    ddim_eta: float = 0.0  # 0 = DDIM mode, 1 = DDPM mode
    ddim_timesteps: int = 10  # -1 uses original timesteps

    # DPM-Solver++ (2nd-order multistep ODE sampler; overrides DDIM when set)
    use_dpm_solver: bool = False
    dpm_steps: int = 20
    dpm_order: int = 2
    dpm_time_spacing: str = "strided"  # strided | logsnr

    # EDM / Karras sampler (Heun + rho-grid + optional churn; overrides both)
    use_karras_sampler: bool = False
    karras_steps: int = 18
    karras_order: int = 2
    karras_s_churn: float = 0.0

    # UniPC (predictor-corrector multistep; corrector is free — overrides all)
    use_unipc: bool = False
    unipc_steps: int = 20
    unipc_order: int = 2
    unipc_corrector: bool = True
    unipc_variant: str = "bh2"  # bh1 | bh2

    # Output
    output_dir: str = "samples"
    add_timestamp: bool = True
    grid_plot: bool = True

    # animation
    show_diffusion: bool = False
    frame_step: int = 1
    fps: int = 30

    seed: Optional[int] = None
    use_ema: bool = True


def maybe_use_ddim_sampler(model: DDPM, cfg: EvalConfig) -> None:
    if getattr(cfg, "use_unipc", False):
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.UniPCDiffusion"
        sampler_cfg["solver_steps"] = cfg.unipc_steps
        sampler_cfg["solver_order"] = cfg.unipc_order
        sampler_cfg["use_corrector"] = cfg.unipc_corrector
        sampler_cfg["variant"] = cfg.unipc_variant
        model.change_sampler(sampler_cfg)
    elif getattr(cfg, "use_karras_sampler", False):
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.KarrasDiffusion"
        sampler_cfg["solver_steps"] = cfg.karras_steps
        sampler_cfg["solver_order"] = cfg.karras_order
        sampler_cfg["s_churn"] = cfg.karras_s_churn
        model.change_sampler(sampler_cfg)
    elif getattr(cfg, "use_dpm_solver", False):
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
    model = DDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    maybe_use_ddim_sampler(model, cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    seed = cfg.seed if cfg.seed is not None else 0
    key = jax.random.PRNGKey(seed)

    out = model.sample(
        batch_size=cfg.batch_size,
        image_size=image_size,
        key=key,
        return_frames=cfg.show_diffusion,
    )
    frames = None
    if cfg.show_diffusion:
        imgs, frames = out
    else:
        imgs = out
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
    if frames is not None:
        save_animation(np.asarray(frames), str(out_dir / "diffusion"), fps=cfg.fps, frame_step=cfg.frame_step)
    logging.info(f"Saved {imgs.shape[0]} samples to {out_dir}")


if __name__ == "__main__":
    main()
