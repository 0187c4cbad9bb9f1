"""Super-resolve images with a trained SR3 archive (counterpart of
examples/ddpm/eval_ddpm.py for the super-resolution family).

Inputs: an image directory / .npy/.npz (treated as HR ground truth —
degraded on the fly so PSNR can be reported) or, with no input, HR images
synthesized by sampling is meaningless for SR, so input_path is required
unless the archive's dataset config points at a loadable dataset.

Supports the stock sampler swaps (DDIM/DPM-Solver) since SR3's conditioning
is bound inside the model function.
"""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import SR3
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class EvalConfig:
    model_path: str = "SR3.dmn"
    input_path: str = ""        # HR images: dir / .npy / .npz (file-dataset formats)
    dataset_name: str = ""      # alternative: a dataset name (e.g. synthetic)
    batch_size: int = 8

    # sampler swaps (same flags as eval_ddpm.py)
    use_ddim_sampler: bool = False
    ddim_timesteps: int = 50
    eta: float = 0.0
    use_dpm_solver: bool = False
    dpm_steps: int = 20

    output_dir: str = "sr_samples"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


def _swap_sampler(model, cfg):
    sampler_cfg = dict(model.cfg.sampler)
    if cfg.use_dpm_solver:
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.DPMSolverDiffusion"
        sampler_cfg["solver_steps"] = cfg.dpm_steps
        model.change_sampler(sampler_cfg)
    elif cfg.use_ddim_sampler:
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = cfg.eta
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = SR3.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    _swap_sampler(model, cfg)
    image_size = int(model.image_size)
    channels = int(model.channels)

    if cfg.input_path or cfg.dataset_name:
        ds_cfg = (
            {"name": "file", "path": cfg.input_path}
            if cfg.input_path
            else {"name": cfg.dataset_name}
        )
        ds_cfg.update(
            {
                "batch_size": cfg.batch_size,
                "image_size": image_size,
                "channels": channels,
                "shuffle": False,
                "num_workers": 0,
            }
        )
        from diffusion_model_nemo_tpu.data.hf_vision_data import build_dataloader

        batch = next(iter(build_dataloader(ds_cfg, mode="test")))
        key_name = "pixel_values" if "pixel_values" in batch else "image"
        hr = np.asarray(batch[key_name])[: cfg.batch_size]
        hr = hr.astype(np.float32) / 255.0 if hr.dtype == np.uint8 else hr
    else:
        raise ValueError("eval_sr3 needs input_path= or dataset_name=")

    hr = jnp.asarray(hr, jnp.float32)
    lr = (model.degrade(hr * 2.0 - 1.0) + 1.0) * 0.5  # display-space LR

    seed = cfg.seed if cfg.seed is not None else 0
    sr = model.super_resolve(lr, key=jax.random.PRNGKey(seed))
    sr = np.asarray(sr)
    psnr = np.asarray(model.psnr(sr, np.asarray(hr)))
    logging.info(f"PSNR vs ground truth: mean {psnr.mean():.2f} dB ({psnr.round(2).tolist()})")

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    lr_up = np.asarray((model.upsample(jnp.asarray(lr) * 2.0 - 1.0) + 1.0) * 0.5)
    save_image_grid(np.asarray(hr), str(out_dir / "hr.png"), nrow=6)
    save_image_grid(np.clip(lr_up, 0, 1), str(out_dir / "lr_upsampled.png"), nrow=6)
    save_image_grid(sr, str(out_dir / "sr.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(sr)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"sr_{i}.png"
        )
    logging.info(f"Saved {sr.shape[0]} super-resolved images to {out_dir}")


if __name__ == "__main__":
    main()
