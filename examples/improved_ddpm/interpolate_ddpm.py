"""Interpolate two dataset images in q-space and re-denoise
(counterpart of reference examples/improved_ddpm/interpolate_ddpm.py)."""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.data import build_dataloader, preprocess_batch
from diffusion_model_nemo_tpu.models import ImprovedDDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid


@dataclass
class InterpolateConfig:
    model_path: str = "ImprovedDDPM.dmn"
    dataset_name: Optional[str] = None
    dataset_split: str = "test"
    batch_size: int = 8
    t: Optional[int] = None  # noising depth; default T-1
    lambd: float = 0.5
    output_dir: str = "interpolations"
    seed: int = 0
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="InterpolateConfig", schema=InterpolateConfig)
def main(cfg):
    cfg = InterpolateConfig(**cfg)
    model = ImprovedDDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    name = cfg.dataset_name or (model.cfg.get("train_ds") or {}).get("name")
    dl = build_dataloader(
        {"name": name, "split": cfg.dataset_split, "batch_size": 2 * cfg.batch_size},
        mode="test",
    )
    batch = next(iter(dl))
    proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), train=False)
    x = proc["pixel_values"]
    x1, x2 = x[: cfg.batch_size], x[cfg.batch_size : 2 * cfg.batch_size]

    out = model.interpolate(x1, x2, t=cfg.t, lambd=cfg.lambd, key=jax.random.PRNGKey(cfg.seed))
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_image_grid(np.asarray(out), str(out_dir / "interpolation.png"), nrow=cfg.batch_size)
    save_image_grid(np.asarray((x1 + 1) / 2), str(out_dir / "endpoint_a.png"), nrow=cfg.batch_size)
    save_image_grid(np.asarray((x2 + 1) / 2), str(out_dir / "endpoint_b.png"), nrow=cfg.batch_size)
    logging.info(f"Saved interpolations to {out_dir}")


if __name__ == "__main__":
    main()
