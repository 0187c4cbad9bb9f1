"""Non-leaky augmentation pipeline (EDM-style), pure JAX.

Beyond the reference's surface (its only augmentation is a horizontal flip,
data/hf_vision_data.py transforms): Karras et al. 2022 ("Elucidating the
Design Space...", §5) show diffusion models on small datasets overfit
without augmentation, but naive augmentation LEAKS — the model generates
augmented images. The fix: apply geometric transforms with probability p
AND condition the network on a descriptor of the applied transform; at
sampling time the descriptor is all-zeros ("nothing was applied"), so the
augmentations regularize without leaking.

TPU design: the whole pipe is jit-compatible and runs INSIDE the training
step on device (gate sampling -> per-image affine compose -> one bilinear
gather), so augmented batches never touch the host. Each enabled transform
gates on an independent per-image Bernoulli(p); gated-off parameters are
exactly zero, which makes the descriptor's zero vector the identity BY
CONSTRUCTION (the non-leaky convention needs no special casing).

Descriptor layout (AUGMENT_DIM = 9), zero == identity:
  [0] x-flip applied (0/1)
  [1] y-flip applied (0/1)
  [2] x-translation, fraction of width
  [3] y-translation, fraction of height
  [4] log2 isotropic scale
  [5] cos(rotation) - 1
  [6] sin(rotation)
  [7] log2 anisotropic scale (x stretched by a, y by 1/a)
  [8] reserved (always 0)

This is our own descriptor encoding (the technique follows the EDM paper;
the exact 9-float layout here is original and documented for checkpoint
compatibility). Resampling is a single bilinear gather with zero padding —
the paper's wavelet-space filtering is an anti-aliasing refinement, not a
correctness requirement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["AUGMENT_DIM", "sample_augment_labels", "apply_augment", "augment_pipe"]

AUGMENT_DIM = 9


def sample_augment_labels(
    key: jax.Array,
    batch: int,
    p: float,
    *,
    xflip: bool = True,
    yflip: bool = False,
    translate: float = 0.125,
    scale_std: float = 0.2,
    rotate: bool = True,
    aniso_std: float = 0.2,
) -> jnp.ndarray:
    """Draw a [B, 9] descriptor batch; each transform gates independently
    on Bernoulli(p) per image (disabled transforms stay identically zero)."""
    ks = jax.random.split(key, 14)
    gate = lambda k: jax.random.bernoulli(k, p, (batch,)).astype(jnp.float32)

    fx = gate(ks[0]) * jax.random.bernoulli(ks[1], 0.5, (batch,)) if xflip else jnp.zeros(batch)
    fy = gate(ks[2]) * jax.random.bernoulli(ks[3], 0.5, (batch,)) if yflip else jnp.zeros(batch)
    tx = gate(ks[4]) * jax.random.normal(ks[5], (batch,)) * translate if translate else jnp.zeros(batch)
    ty = gate(ks[6]) * jax.random.normal(ks[7], (batch,)) * translate if translate else jnp.zeros(batch)
    ls = gate(ks[8]) * jax.random.normal(ks[9], (batch,)) * scale_std if scale_std else jnp.zeros(batch)
    theta = (
        gate(ks[10]) * jax.random.uniform(ks[11], (batch,), minval=-jnp.pi, maxval=jnp.pi)
        if rotate
        else jnp.zeros(batch)
    )
    la = gate(ks[12]) * jax.random.normal(ks[13], (batch,)) * aniso_std if aniso_std else jnp.zeros(batch)

    return jnp.stack(
        [
            fx.astype(jnp.float32),
            fy.astype(jnp.float32),
            tx,
            ty,
            ls,
            jnp.cos(theta) - 1.0,
            jnp.sin(theta),
            la,
            jnp.zeros(batch, jnp.float32),
        ],
        axis=-1,
    )


def apply_augment(images: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Apply the transforms a [B, 9] descriptor describes to NHWC images.

    Forward model in centered pixel coordinates (x right, y down):
        p_out = R(theta) @ diag(s*a*(1-2*fx), (s/a)*(1-2*fy)) @ p_in + t
    so sampling inverts: p_in = D^{-1} R(-theta) (p_out - t). One bilinear
    gather per image (zero padding outside). A zero descriptor reproduces
    the input bitwise at integer coordinates.
    """
    B, H, W, C = images.shape
    fx, fy, tx, ty = labels[:, 0], labels[:, 1], labels[:, 2], labels[:, 3]
    s = jnp.exp2(labels[:, 4])
    cos_t = labels[:, 5] + 1.0
    sin_t = labels[:, 6]
    a = jnp.exp2(labels[:, 7])

    dx = s * a * (1.0 - 2.0 * fx)
    dy = (s / a) * (1.0 - 2.0 * fy)
    tx_pix = tx * W
    ty_pix = ty * H

    # output pixel grid, centered
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0,
        jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0,
        indexing="ij",
    )

    def one(img, dx, dy, cos_t, sin_t, tx_pix, ty_pix):
        xo = xx - tx_pix
        yo = yy - ty_pix
        # R(-theta)
        xr = cos_t * xo + sin_t * yo
        yr = -sin_t * xo + cos_t * yo
        xi = xr / dx + (W - 1) / 2.0
        yi = yr / dy + (H - 1) / 2.0

        def chan(c):
            return jax.scipy.ndimage.map_coordinates(
                c, [yi, xi], order=1, mode="constant", cval=0.0
            )

        return jnp.stack([chan(img[..., k]) for k in range(C)], axis=-1)

    return jax.vmap(one)(images, dx, dy, cos_t, sin_t, tx_pix, ty_pix)


def augment_pipe(
    images: jnp.ndarray,
    key: jax.Array,
    p: float,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(augmented images, [B, 9] descriptor). ``p == 0`` returns the input
    unchanged (and an all-zero descriptor) without any resampling."""
    B = images.shape[0]
    if p <= 0.0:
        return images, jnp.zeros((B, AUGMENT_DIM), jnp.float32)
    labels = sample_augment_labels(key, B, p, **kwargs)
    return apply_augment(images, labels), labels
