"""WaveGrad audio vocoder network (mel → waveform), Chen et al. 2020.

The reference repository's WaveGrad port is image-shaped (its WaveGradDiffusion
trains on vision data); the benchmark's fifth config calls for a true audio
vocoder, implemented here TPU-first:

- 1-D channels-last layout [B, T, C]; all convs are lax 1-D convolutions
  that XLA tiles onto the MXU.
- The **UBlock chain** upsamples mel features (frame rate) to the waveform
  rate through dilated conv stacks; the **DBlock chain** downsamples the
  noisy waveform; **FiLM** modules fuse DBlock features with the continuous
  √ᾱ noise-level encoding to modulate the UBlocks — the WaveGrad paper's
  topology with upsample factors whose product equals the STFT hop.
- Conditioned on the same continuous noise level as WaveGradDiffusion
  (sqrt-alpha-cumprod sampling, wavegrad_diffusion.py), so the existing
  process/sampler stack drives it unchanged (data rank is generic).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_target

__all__ = ["WaveGradVocoder"]


def _resolve_dtype(dtype):
    if isinstance(dtype, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[dtype]
    return dtype


class NoiseLevelEncoding(nn.Module):
    """Sinusoidal encoding of the continuous √ᾱ level (scaled like the
    reference's WaveGrad PositionalEncoding, parts/film.py:11-25)."""

    channels: int
    scale: float = 5000.0

    @nn.compact
    def __call__(self, level):  # [B] or [B,1,1,1]
        level = level.reshape(level.shape[0])
        half = self.channels // 2
        exponents = 1e-4 ** (jnp.arange(half, dtype=jnp.float32) / half)
        angles = self.scale * level[:, None] * exponents[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)  # [B, C]


class FiLM1D(nn.Module):
    """(scale, shift) from DBlock features + noise-level encoding."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, level):  # x: [B, T, C]
        C = x.shape[-1]
        h = nn.Conv(C, (3,), padding=1, dtype=self.dtype, name="signal_conv")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        enc = NoiseLevelEncoding(C, name="level_enc")(level).astype(h.dtype)
        h = h + enc[:, None, :]
        scale = nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype, name="scale_conv")(h)
        shift = nn.Conv(self.out_channels, (3,), padding=1, dtype=self.dtype, name="shift_conv")(h)
        return scale, shift


class DBlock(nn.Module):
    """Waveform downsampling block: factor-D strided path + residual."""

    out_channels: int
    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, C] → [B, T/factor, out]
        res = nn.Conv(self.out_channels, (1,), strides=(self.factor,), dtype=self.dtype, name="res")(x)
        h = x
        for i, dil in enumerate((1, 2, 4)):
            h = nn.leaky_relu(h, negative_slope=0.2)
            stride = (self.factor,) if i == 0 else (1,)
            h = nn.Conv(
                self.out_channels,
                (3,),
                strides=stride,
                kernel_dilation=(dil,) if i > 0 else (1,),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv{i}",
            )(h)
        return h + res


class UBlock(nn.Module):
    """Feature upsampling block with two FiLM-modulated dilated stages."""

    out_channels: int
    factor: int
    dilations: Sequence[int] = (1, 2, 4, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, film: Tuple[jnp.ndarray, jnp.ndarray]):
        scale, shift = film
        B, T, C = x.shape
        up = jnp.repeat(x, self.factor, axis=1)  # nearest-neighbor upsample

        res = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="res")(up)

        h = nn.leaky_relu(up, negative_slope=0.2)
        h = nn.Conv(
            self.out_channels, (3,), kernel_dilation=(self.dilations[0],), padding="SAME",
            dtype=self.dtype, name="conv0",
        )(h)
        h = scale * h + shift  # FiLM (at the upsampled rate)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(
            self.out_channels, (3,), kernel_dilation=(self.dilations[1],), padding="SAME",
            dtype=self.dtype, name="conv1",
        )(h)
        h = h + res

        res2 = h
        h = scale * h + shift
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(
            self.out_channels, (3,), kernel_dilation=(self.dilations[2],), padding="SAME",
            dtype=self.dtype, name="conv2",
        )(h)
        h = scale * h + shift
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(
            self.out_channels, (3,), kernel_dilation=(self.dilations[3],), padding="SAME",
            dtype=self.dtype, name="conv3",
        )(h)
        return h + res2


@register_target(
    "diffusion_model_nemo.modules.WaveGradVocoder",
    "diffusion_model_nemo_tpu.modules.WaveGradVocoder",
)
class WaveGradVocoder(nn.Module):
    """Mel → waveform denoiser conditioned on continuous noise level.

    ``__call__(y_noisy [B, T, 1], noise_level [B,1,1,1] or [B], mel
    [B, frames, n_mels])`` → predicted noise [B, T, 1].
    ``prod(upsample_factors)`` must equal the STFT hop (T = frames · hop).
    """

    n_mels: int = 80
    hop: int = 300
    upsample_factors: Sequence[int] = (5, 5, 3, 2, 2)
    up_channels: Sequence[int] = (512, 512, 256, 128, 128)
    down_channels: Sequence[int] = (128, 128, 256, 512)
    base_channels: int = 32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, y, noise_level, mel, *, deterministic: bool = True):
        import numpy as np

        dtype = _resolve_dtype(self.dtype)
        factors = tuple(self.upsample_factors)
        assert int(np.prod(factors)) == int(self.hop), (
            f"prod(upsample_factors)={np.prod(factors)} must equal hop={self.hop}"
        )
        y = y.astype(dtype)
        mel = mel.astype(dtype)

        # --- downsample the noisy waveform; one DBlock per FiLM stage -------
        d_feats = []
        h = nn.Conv(self.base_channels, (5,), padding="SAME", dtype=dtype, name="d_stem")(y)
        d_feats.append(h)  # waveform rate
        down_factors = list(reversed(factors))[:-1]  # stages between FiLMs
        for i, (ch, f) in enumerate(zip(self.down_channels, down_factors)):
            h = DBlock(ch, f, dtype=dtype, name=f"dblock_{i}")(h)
            d_feats.append(h)

        # FiLM per stage, matched to the UBlock *input* rates (deep → shallow)
        films = []
        for i, feat in enumerate(reversed(d_feats)):
            out_ch = self.up_channels[i]
            films.append(
                FiLM1D(out_ch, dtype=dtype, name=f"film_{i}")(feat, noise_level)
            )

        # --- upsample mel features to the waveform rate ----------------------
        # Rates line up by construction: UBlock i's post-upsample rate equals
        # the (deep→shallow) DBlock feature rate FiLM i was computed from
        # (e.g. hop 300 = 5·5·3·2·2: U-rates T/60, T/12, T/4, T/2, T match
        # D-rates reversed).
        x = nn.Conv(self.up_channels[0], (3,), padding="SAME", dtype=dtype, name="u_stem")(mel)
        for i, (ch, f) in enumerate(zip(self.up_channels, factors)):
            x = UBlock(ch, f, dtype=dtype, name=f"ublock_{i}")(x, films[i])

        out = nn.Conv(1, (3,), padding="SAME", dtype=dtype, name="out_conv")(x)
        return out.astype(jnp.float32)
