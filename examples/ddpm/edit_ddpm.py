"""SDEdit image-to-image editing from a trained DDPM-family archive (beyond
the reference's example surface — Meng et al. 2022 guided editing with any
trained model, no retraining).

Inputs: an archive + either an image directory / .npy/.npz file
(data/file_vision_data.py formats) or, with no input given, images sampled
from the model itself (self-edit demo: the model re-imagines its own
samples). ``strength`` in [0, 1] picks how much of the reverse chain is
re-run — low preserves structure, high re-imagines.

python edit_ddpm.py model_path=DDPM.dmn input_path=imgs/ strength=0.5 \
    output_dir=edited
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

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import save_image_grid, to_uint8


@dataclass
class EditConfig:
    model_path: str = "DDPM.dmn"
    input_path: str = ""         # image dir / .npy / .npz; "" = sample from the model
    batch_size: int = 8
    strength: float = 0.5        # fraction of the reverse chain to re-run

    output_dir: str = "edited"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="EditConfig", schema=EditConfig)
def main(cfg):
    cfg = EditConfig(**cfg)
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    if not hasattr(model, "edit"):
        raise ValueError(
            f"{type(model).__name__} has no edit surface (SDEdit needs a "
            "DDPM-family ancestral sampler)"
        )
    image_size = int(model.image_size)
    channels = int(model.channels)
    seed = cfg.seed if cfg.seed is not None else 0
    key = jax.random.PRNGKey(seed)
    key, k_src, k_edit = jax.random.split(key, 3)

    if cfg.input_path:
        from inpaint_ddpm import load_images

        src = load_images(cfg.input_path, cfg.batch_size, image_size, channels)
    else:
        logging.info("No input_path given — sampling source images from the model")
        src = np.asarray(
            model.sample(batch_size=cfg.batch_size, image_size=image_size, key=k_src)
        )
    src = jnp.asarray(src[: cfg.batch_size], jnp.float32)

    out = np.asarray(model.edit(src, strength=cfg.strength, key=k_edit))

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    save_image_grid(np.asarray(src), str(out_dir / "input.png"), nrow=6)
    save_image_grid(out, str(out_dir / "edited.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(out)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"edited_{i}.png"
        )
    logging.info(
        f"Saved {out.shape[0]} edited images (strength={cfg.strength}) to {out_dir}"
    )


if __name__ == "__main__":
    main()
