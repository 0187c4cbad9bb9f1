"""Sample from a trained text-conditional archive with a prompt.

Counterpart of examples/ddpm/eval_ddpm.py for the TextConditionalDDPM
family (beyond the reference — its only conditioning is a class label):
``text=`` prompts the model (empty = unconditional / null context),
``guidance_scale=`` applies classifier-free guidance over the text.

    python sample_text_dit.py model_path=TextDDPM-DiT.dmn \
        text="a photo of class 3" guidance_scale=3.0 batch_size=16 \
        use_ddim_sampler=true ddim_timesteps=50
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

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.models.text_conditional_ddpm import TextConditionalDDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class SampleTextConfig:
    model_path: str = "TextDDPM-DiT.dmn"
    text: str = ""                 # "" = unconditional (null context)
    negative_text: str = ""        # CFG anchor to push away from (needs guidance)
    context_npy: str = ""          # .npy float context [B|1, L, D] or [L, D] from
                                   # an external text encoder (replaces text=)
    guidance_scale: float = -1.0   # <= 0 disables CFG
    batch_size: int = 16
    image_size: int = -1

    use_ddim_sampler: bool = False
    ddim_eta: float = 0.0
    ddim_timesteps: int = 50

    output_dir: str = "samples"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="SampleTextConfig", schema=SampleTextConfig)
def main(cfg):
    cfg = SampleTextConfig(**cfg)
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    if not isinstance(model, TextConditionalDDPM):
        raise ValueError(
            f"{cfg.model_path} is a {type(model).__name__} archive; "
            "sample_text_dit.py needs a TextConditionalDDPM"
        )
    if cfg.use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = cfg.ddim_eta
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)

    image_size = cfg.image_size if cfg.image_size > 0 else int(model.image_size)
    key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    text = cfg.text or None
    w = cfg.guidance_scale if cfg.guidance_scale > 0 else None

    context = None
    if cfg.context_npy:
        # Precomputed float contexts from ANY external text encoder (the DiT
        # cross-attends to [B, L, context_dim] sequences directly —
        # modules/dit.py). [1, L, D] broadcasts over the batch.
        context = np.load(cfg.context_npy, allow_pickle=False)
        if context.ndim == 3 and context.shape[0] == 1:
            context = np.tile(context, (cfg.batch_size, 1, 1))

    imgs = np.asarray(
        model.sample(
            batch_size=cfg.batch_size,
            image_size=image_size,
            key=key,
            text=text,
            guidance_scale=w,
            negative_text=cfg.negative_text or None,
            context=context,
        )
    )

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)
    save_image_grid(imgs, str(out_dir / "samples_grid.png"), nrow=4)
    from PIL import Image

    for i, img in enumerate(to_uint8(imgs)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"sample_{i}.png"
        )
    what = f"external context {cfg.context_npy!r}" if cfg.context_npy else f"prompt {cfg.text!r}"
    logging.info(
        f"Saved {imgs.shape[0]} samples for {what} (guidance={w}) to {out_dir}"
    )


if __name__ == "__main__":
    main()
