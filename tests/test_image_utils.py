"""Image grid / PNG / animation helpers."""

import numpy as np
import pytest

from diffusion_model_nemo_tpu.utils.image import (
    make_grid,
    save_animation,
    save_image_grid,
    to_uint8,
)


def test_to_uint8_clipping():
    x = np.array([[[[-0.5]], [[0.5]], [[1.5]]]], np.float32).reshape(1, 3, 1, 1)
    out = to_uint8(x)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_make_grid_geometry():
    imgs = np.random.rand(5, 4, 6, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=3, padding=1)
    # 2 rows x 3 cols of 4x6 tiles + padding
    assert grid.shape == (2 * 5 + 1, 3 * 7 + 1, 3)


def test_save_image_grid_roundtrip(tmp_path):
    from PIL import Image

    imgs = np.random.rand(4, 8, 8, 1).astype(np.float32)
    path = save_image_grid(imgs, str(tmp_path / "g.png"), nrow=2)
    im = Image.open(path)
    assert im.size[0] > 8 and im.size[1] > 8


def test_save_animation_gif(tmp_path):
    from PIL import Image

    frames = np.random.rand(6, 2, 8, 8, 3).astype(np.float32)
    path = save_animation(frames, str(tmp_path / "anim"), fps=10, frame_step=2)
    im = Image.open(path)
    assert im.format == "GIF"
    assert getattr(im, "n_frames", 1) == 3  # 6 frames strided by 2
