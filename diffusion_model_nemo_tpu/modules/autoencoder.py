"""KL-regularized convolutional autoencoder for latent diffusion.

Beyond the reference's component surface (all its families diffuse in pixel
space, diffusion_model_nemo/models/): this is the VAE stage of a latent
diffusion model (Rombach et al. 2022, arXiv:2112.10752) — an encoder mapping
images to a diagonal-Gaussian posterior over a spatially-downsampled latent,
and a decoder mapping latents back to pixels. Any DDPM-family process then
runs unchanged in the latent space (models/latent_diffusion.py).

TPU-native design points (same rules as modules/unet.py): NHWC layout,
configurable bfloat16 compute with float32 params, reuse of the parity-tested
``ResnetBlock``/``SelfAttentionBlock``/``Downsample``/``Upsample`` parts so
the Pallas attention kernels and fused norms dispatch here too, and the
posterior sample/KL as pure functions so training steps stay jittable with
explicit keys.

Architecture (per Rombach et al.'s ``AutoencoderKL``, simplified to this
repo's part set): stem conv → per level [ResnetBlock ×2] + strided-conv
Downsample (all but last) → mid [block, full attention, block] → GroupNorm/
SiLU/conv to 2·z_channels (mean ‖ logvar). Decoder mirrors with ConvTranspose
Upsample. Spatial downsample factor = 2^(len(dim_mults) − 1).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_target
from .parts import (
    Downsample,
    FusedGroupNormSiLU,
    ResnetBlock,
    SelfAttentionBlock,
    Upsample,
)
from .unet import _resolve_dtype

__all__ = [
    "AutoencoderKL",
    "Encoder",
    "Decoder",
    "diagonal_gaussian_sample",
    "diagonal_gaussian_kl",
    "LOGVAR_CLIP",
]

# LDM clamps the encoder's logvar to [-30, 20] before exp() so early-training
# outliers cannot overflow the posterior std in float32.
LOGVAR_CLIP = (-30.0, 20.0)


def diagonal_gaussian_sample(
    mean: jnp.ndarray, logvar: jnp.ndarray, key: Optional[jax.Array]
) -> jnp.ndarray:
    """Reparameterized draw z = μ + σ·ε  (ε ~ N(0, I)); ``key=None`` → mode μ."""
    if key is None:
        return mean
    logvar = jnp.clip(logvar, *LOGVAR_CLIP)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def diagonal_gaussian_kl(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(μ, σ²) ‖ N(0, I)) summed over latent dims → [B].

    Closed form 0.5·Σ (μ² + σ² − 1 − log σ²); per-sample SUM (not mean) to
    match the LDM weighting convention (kl_weight ≈ 1e-6 against a
    per-sample-summed reconstruction term).
    """
    logvar = jnp.clip(logvar, *LOGVAR_CLIP)
    axes = tuple(range(1, mean.ndim))
    return 0.5 * jnp.sum(
        jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar, axis=axes
    )


class Encoder(nn.Module):
    """Image [B, S, S, C] → (mean, logvar), each [B, S/f, S/f, z_channels]."""

    dim: int
    dim_mults: Sequence[int] = (1, 2, 4)
    z_channels: int = 4
    resnet_block_groups: int = 8
    dropout: Optional[float] = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dtype = _resolve_dtype(self.dtype)
        dims: List[int] = [self.dim * m for m in self.dim_mults]
        x = x.astype(dtype)
        x = nn.Conv(dims[0], (3, 3), dtype=dtype, name="stem")(x)
        for ind, dim_out in enumerate(dims):
            is_last = ind >= len(dims) - 1
            for b in range(2):
                x = ResnetBlock(
                    dim_out, time_emb=False, groups=self.resnet_block_groups,
                    dropout=self.dropout, dtype=dtype, name=f"down_{ind}_block{b + 1}",
                )(x, None, deterministic=deterministic)
            if not is_last:
                x = Downsample(dim_out, dtype=dtype, name=f"down_{ind}_downsample")(x)
        x = ResnetBlock(
            dims[-1], time_emb=False, groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=dtype, name="mid_block1",
        )(x, None, deterministic=deterministic)
        x = SelfAttentionBlock(linear=False, dtype=dtype, name="mid_attn")(x)
        x = ResnetBlock(
            dims[-1], time_emb=False, groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=dtype, name="mid_block2",
        )(x, None, deterministic=deterministic)
        x = FusedGroupNormSiLU(
            groups=self.resnet_block_groups, epsilon=1e-5, dtype=dtype, name="out_norm"
        )(x)
        moments = nn.Conv(2 * self.z_channels, (3, 3), dtype=dtype, name="out_conv")(x)
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, logvar


class Decoder(nn.Module):
    """Latent [B, S/f, S/f, z_channels] → image [B, S, S, C] (in [-1, 1])."""

    dim: int
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 3
    resnet_block_groups: int = 8
    dropout: Optional[float] = None
    dtype: str = "float32"

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True) -> jnp.ndarray:
        dtype = _resolve_dtype(self.dtype)
        dims: List[int] = [self.dim * m for m in self.dim_mults]
        x = z.astype(dtype)
        x = nn.Conv(dims[-1], (3, 3), dtype=dtype, name="stem")(x)
        x = ResnetBlock(
            dims[-1], time_emb=False, groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=dtype, name="mid_block1",
        )(x, None, deterministic=deterministic)
        x = SelfAttentionBlock(linear=False, dtype=dtype, name="mid_attn")(x)
        x = ResnetBlock(
            dims[-1], time_emb=False, groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=dtype, name="mid_block2",
        )(x, None, deterministic=deterministic)
        for ind, dim_out in enumerate(reversed(dims)):
            is_last = ind >= len(dims) - 1
            for b in range(2):
                x = ResnetBlock(
                    dim_out, time_emb=False, groups=self.resnet_block_groups,
                    dropout=self.dropout, dtype=dtype, name=f"up_{ind}_block{b + 1}",
                )(x, None, deterministic=deterministic)
            if not is_last:
                x = Upsample(dim_out, dtype=dtype, name=f"up_{ind}_upsample")(x)
        x = FusedGroupNormSiLU(
            groups=self.resnet_block_groups, epsilon=1e-5, dtype=dtype, name="out_norm"
        )(x)
        x = nn.Conv(self.channels, (3, 3), dtype=dtype, name="out_conv")(x)
        return x.astype(jnp.float32)


@register_target(
    "diffusion_model_nemo_tpu.modules.AutoencoderKL",
    "diffusion_model_nemo.modules.AutoencoderKL",
)
class AutoencoderKL(nn.Module):
    """Encoder + diagonal-Gaussian posterior + decoder.

    ``encode``/``decode`` are exposed as flax methods so consumers can apply
    each half separately::

        mean, logvar = ae.apply({"params": p}, x, method=AutoencoderKL.encode)
        x_rec = ae.apply({"params": p}, z, method=AutoencoderKL.decode)
    """

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4)
    z_channels: int = 4
    channels: int = 3
    resnet_block_groups: int = 8
    dropout: Optional[float] = None
    dtype: str = "float32"

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(tuple(self.dim_mults)) - 1)

    def setup(self):
        self.encoder = Encoder(
            dim=self.dim, dim_mults=tuple(self.dim_mults),
            z_channels=self.z_channels, resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=self.dtype,
        )
        self.decoder = Decoder(
            dim=self.dim, dim_mults=tuple(self.dim_mults),
            channels=self.channels, resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout, dtype=self.dtype,
        )

    def encode(self, x, *, deterministic: bool = True):
        return self.encoder(x, deterministic=deterministic)

    def decode(self, z, *, deterministic: bool = True):
        return self.decoder(z, deterministic=deterministic)

    def __call__(
        self,
        x,
        key: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Full pass: (reconstruction, posterior mean, posterior logvar).

        ``key`` draws the posterior sample; ``None`` decodes the mode.
        """
        mean, logvar = self.encode(x, deterministic=deterministic)
        z = diagonal_gaussian_sample(mean, logvar, key)
        rec = self.decode(z, deterministic=deterministic)
        return rec, mean, logvar
