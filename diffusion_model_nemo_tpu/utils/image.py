"""Image grid/PNG/animation helpers (torchvision.utils.save_image equivalent).

The reference uses torchvision ``save_image`` for sample dumps
(abstract_diffusion_model.py:122) and matplotlib for eval-script grids /
animations. Implemented here with numpy + PIL only.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["make_grid", "save_image_grid", "to_uint8", "save_animation"]


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[B, H, W, C] floats in [0, 1] → uint8."""
    images = np.clip(np.asarray(images), 0.0, 1.0)
    return (images * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 6, padding: int = 2) -> np.ndarray:
    """Tile [B, H, W, C] into a single [H', W', C] uint8 grid."""
    images = to_uint8(images)
    b, h, w, c = images.shape
    ncol = min(nrow, b)
    nrows = (b + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c), np.uint8
    )
    for idx in range(b):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 6) -> str:
    from PIL import Image

    grid = make_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(path)
    return path


def save_animation(
    frames: np.ndarray, path: str, fps: int = 30, frame_step: int = 1
) -> Optional[str]:
    """Save a [T, B, H, W, C] trajectory as GIF (first sample in the batch).

    The reference writes mp4/gif via matplotlib.animation
    (examples/ddpm/eval_ddpm.py:95-149); GIF via PIL needs no ffmpeg.
    """
    from PIL import Image

    frames = np.asarray(frames)[::frame_step, 0]
    imgs = [Image.fromarray(f[..., 0] if f.shape[-1] == 1 else f) for f in to_uint8(frames)]
    path = str(Path(path).with_suffix(".gif"))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=max(1000 // fps, 20), loop=0
    )
    return path
