"""Sample from a trained EDM archive (counterpart of examples/ddpm/eval_ddpm.py
for the EDM family — the sampler is already the Algorithm-2 Heun integrator,
so the knobs are the grid size, solver order, and stochastic churn instead of
a sampler swap)."""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_animation, save_image_grid, to_uint8


@dataclass
class EvalConfig:
    model_path: str = "EDM.dmn"
    batch_size: int = 32
    image_size: int = -1

    num_steps: int = -1       # sigma-grid size; -1 keeps the archive's sample_steps
    solver: str = ""          # heun | euler; "" keeps the archive's solver
    s_churn: float = -1.0     # stochastic churn; -1 keeps the archive's value

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

    # class-conditional archives (ConditionalEDM)
    label: int = -1           # class to sample; -1 = unconditional (null class)
    guidance_scale: float = -1.0  # classifier-free guidance weight; -1 = off


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    if cfg.solver or cfg.s_churn >= 0.0:
        sampler_cfg = dict(model.cfg.sampler)
        if cfg.solver:
            sampler_cfg["solver"] = cfg.solver
        if cfg.s_churn >= 0.0:
            sampler_cfg["s_churn"] = cfg.s_churn
        model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    seed = cfg.seed if cfg.seed is not None else 0
    key = jax.random.PRNGKey(seed)

    sample_kwargs = {}
    if cfg.label >= 0:
        sample_kwargs["label"] = cfg.label
    if cfg.guidance_scale >= 0.0:
        sample_kwargs["guidance_scale"] = cfg.guidance_scale
    out = model.sample(
        batch_size=cfg.batch_size,
        image_size=image_size,
        key=key,
        num_steps=(cfg.num_steps if cfg.num_steps > 0 else None),
        return_frames=cfg.show_diffusion,
        **sample_kwargs,
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
