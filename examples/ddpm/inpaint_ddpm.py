"""RePaint inpainting from a trained DDPM-family archive (beyond the
reference's example surface — Lugmayr et al. 2022 mask-conditioned
generation with any trained model, no retraining).

Inputs: an archive + either an image directory / .npy/.npz file
(data/file_vision_data.py formats) or, with no input given, images sampled
from the model itself (self-inpainting demo). The mask is a named pattern
(left|right|top|bottom half, center box, random patches) or a .npy file.

python inpaint_ddpm.py model_path=DDPM.dmn input_path=imgs/ mask=center \
    jump_length=10 jump_n_sample=10 output_dir=inpainted
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
class InpaintConfig:
    model_path: str = "DDPM.dmn"
    input_path: str = ""         # image dir / .npy / .npz; "" = sample from the model
    batch_size: int = 8

    mask: str = "center"         # left|right|top|bottom|center|random | path to .npy
    mask_fraction: float = 0.5   # masked fraction for the named patterns
    jump_length: int = 10
    jump_n_sample: int = 10

    output_dir: str = "inpainted"
    add_timestamp: bool = True
    seed: Optional[int] = None
    use_ema: bool = True


def build_mask(name: str, shape, fraction: float, key) -> np.ndarray:
    """[1, H, W, 1] float mask, 1 = keep, 0 = generate."""
    H, W = shape[1], shape[2]
    m = np.ones((1, H, W, 1), np.float32)
    k = max(1, int(round(fraction * H)))
    kw = max(1, int(round(fraction * W)))
    if name == "left":
        m[:, :, :kw] = 0.0
    elif name == "right":
        m[:, :, W - kw:] = 0.0
    elif name == "top":
        m[:, :k] = 0.0
    elif name == "bottom":
        m[:, H - k:] = 0.0
    elif name == "center":
        h0, w0 = (H - k) // 2, (W - kw) // 2
        m[:, h0 : h0 + k, w0 : w0 + kw] = 0.0
    elif name == "random":
        bits = jax.random.bernoulli(key, 1.0 - fraction, (1, H, W, 1))
        m = np.asarray(bits, np.float32)
    elif name.endswith(".npy"):
        m = np.load(name).astype(np.float32)
        m = m.reshape((1, H, W, -1))[..., :1]
    else:
        raise ValueError(f"unknown mask pattern {name!r}")
    return m


def load_images(path: str, batch_size: int, image_size: int, channels: int) -> np.ndarray:
    """[B, H, W, C] in [0, 1] from the file-dataset formats."""
    from diffusion_model_nemo_tpu.data.hf_vision_data import build_dataloader

    dl = build_dataloader(
        {
            "name": "file",
            "path": path,
            "batch_size": batch_size,
            "image_size": image_size,
            "channels": channels,
            "shuffle": False,
            "num_workers": 0,
        },
        mode="test",
    )
    batch = next(iter(dl))
    key = "pixel_values" if "pixel_values" in batch else "image"
    imgs = np.asarray(batch[key])
    return imgs.astype(np.float32) / 255.0 if imgs.dtype == np.uint8 else imgs


@hydra_runner(config_path=None, config_name="InpaintConfig", schema=InpaintConfig)
def main(cfg):
    cfg = InpaintConfig(**cfg)
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    if not hasattr(model, "inpaint"):
        raise ValueError(
            f"{type(model).__name__} has no inpaint surface (RePaint needs a "
            "DDPM-family ancestral sampler)"
        )
    image_size = int(model.image_size)
    channels = int(model.channels)
    seed = cfg.seed if cfg.seed is not None else 0
    key = jax.random.PRNGKey(seed)
    key, k_mask, k_src, k_paint = jax.random.split(key, 4)

    if cfg.input_path:
        known = load_images(cfg.input_path, cfg.batch_size, image_size, channels)
    else:
        logging.info("No input_path given — sampling ground-truth images from the model")
        known = np.asarray(
            model.sample(batch_size=cfg.batch_size, image_size=image_size, key=k_src)
        )
    known = jnp.asarray(known[: cfg.batch_size], jnp.float32)

    mask = build_mask(cfg.mask, known.shape, cfg.mask_fraction, k_mask)
    out = model.inpaint(
        known,
        jnp.asarray(mask),
        key=k_paint,
        jump_length=cfg.jump_length,
        jump_n_sample=cfg.jump_n_sample,
    )
    out = np.asarray(out)

    out_dir = Path(cfg.output_dir)
    if cfg.add_timestamp:
        out_dir = out_dir / datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    masked_vis = np.asarray(known) * mask  # holes shown black
    save_image_grid(np.asarray(known), str(out_dir / "input.png"), nrow=6)
    save_image_grid(masked_vis, str(out_dir / "masked.png"), nrow=6)
    save_image_grid(out, str(out_dir / "inpainted.png"), nrow=6)
    from PIL import Image

    for i, img in enumerate(to_uint8(out)):
        Image.fromarray(img[..., 0] if img.shape[-1] == 1 else img).save(
            out_dir / f"inpainted_{i}.png"
        )
    logging.info(f"Saved {out.shape[0]} inpainted images to {out_dir}")


if __name__ == "__main__":
    main()
