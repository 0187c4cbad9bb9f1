"""Sample from a trained ScoreSDE archive with the PC or probability-flow
sampler (counterpart of reference examples/score_sde/eval_score_sde.py)."""

import datetime
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.models import ScoreSDE
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class EvalConfig:
    model_path: str = "ScoreSDE.dmn"
    batch_size: int = 32
    image_size: int = -1

    # sampler override
    use_probability_flow_sampler: bool = False
    predictor: Optional[str] = None  # e.g. reverse_diffusion / euler_maruyama
    corrector: Optional[str] = None  # e.g. langevin / ald
    snr: float = 0.16
    n_steps: int = 1

    output_dir: str = "samples"
    add_timestamp: bool = True
    grid_plot: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="EvalConfig", schema=EvalConfig)
def main(cfg):
    cfg = EvalConfig(**cfg)
    model = ScoreSDE.restore_from(cfg.model_path, use_ema=cfg.use_ema)

    if cfg.use_probability_flow_sampler:
        model.change_sampler(
            {"_target_": "diffusion_model_nemo.modules.ProbabilityFlowSampler", "denoise": True}
        )
    elif cfg.predictor is not None or cfg.corrector is not None:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg.update(
            predictor=cfg.predictor, corrector=cfg.corrector, snr=cfg.snr, n_steps=cfg.n_steps
        )
        model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    seed = cfg.seed if cfg.seed is not None else 0

    out = model.sample(
        batch_size=cfg.batch_size,
        image_size=image_size,
        key=jax.random.PRNGKey(seed),
        return_nfe=True,
    )
    imgs, nfe = out if isinstance(out, tuple) else (out, None)
    imgs = np.asarray(imgs)

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    if cfg.grid_plot:
        save_image_grid(imgs, str(out_dir / "samples_grid.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(imgs)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(out_dir / f"sample_{i}.png")
    logging.info(f"Saved {imgs.shape[0]} samples to {out_dir} (NFE={nfe})")


if __name__ == "__main__":
    main()
