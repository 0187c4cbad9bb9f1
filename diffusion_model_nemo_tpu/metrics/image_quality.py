"""Full-reference image-quality metrics: PSNR and SSIM.

Beyond the reference's metric surface (it computes none — SURVEY.md §6);
these are the headline metrics of the SR3 super-resolution family
(models/sr3.py; Saharia et al. 2021 Table 1). SSIM follows Wang et al. 2004
with the standard settings (11x11 Gaussian window, sigma 1.5, K1=0.01,
K2=0.03) so numbers are comparable to scikit-image/tf.image defaults.

TPU notes: the windowed moments are five depthwise convolutions over NHWC
batches — XLA fuses the elementwise SSIM map behind them; everything is
jittable and batch-vectorized (no per-image host loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim"]


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Batch PSNR in dB; inputs [B, H, W, C] on the same scale. Returns [B]."""
    mse = jnp.mean(
        (jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2,
        axis=tuple(range(1, a.ndim)),
    )
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2.0) / sigma) ** 2)
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' convolution of [B, H, W, C] with a [k, k] window."""
    C = x.shape[-1]
    k = jnp.asarray(kern)[:, :, None, None]  # HWIO with I=1
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM per image (Wang et al. 2004 eq. 13, Gaussian-windowed,
    'valid' borders like scikit-image's gaussian_weights=True). Inputs
    [B, H, W, C] (H, W >= window_size); returns [B]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.shape != b.shape or a.ndim != 4:
        raise ValueError(f"ssim expects matching [B,H,W,C], got {a.shape} vs {b.shape}")
    if min(a.shape[1], a.shape[2]) < window_size:
        raise ValueError(
            f"image {a.shape[1]}x{a.shape[2]} smaller than the {window_size}-tap window"
        )
    kern = _gaussian_kernel(window_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_a = _filter(a, kern)
    mu_b = _filter(b, kern)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = _filter(a * a, kern) - mu_aa
    var_b = _filter(b * b, kern) - mu_bb
    cov = _filter(a * b, kern) - mu_ab

    ssim_map = ((2.0 * mu_ab + c1) * (2.0 * cov + c2)) / (
        (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))
