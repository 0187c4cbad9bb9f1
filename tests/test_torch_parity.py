"""Bit-level parity vs PyTorch for the building blocks the reference uses.

These tests transplant weights between torch modules (the reference's
substrate) and our flax modules and require near-exact agreement — the
foundation of the FID/loss-curve-parity claim (BASELINE.md).

Weight mappings: Conv OIHW→HWIO; ConvTranspose IOHW→HWIO + spatial flip
(torch's ConvTranspose is gradient-of-conv, flax's is fractional conv).
"""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_model_nemo_tpu.modules.parts import (
    ResnetBlock,
    SinusoidalPositionEmbeddings,
    Upsample,
)


def conv_w(tconv):
    return jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))


def conv_b(tconv):
    return jnp.asarray(tconv.bias.detach().numpy())


def test_conv_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 5, 7, padding=3)
    fconv = nn.Conv(5, (7, 7), padding=3)
    out_f = fconv.apply(
        {"params": {"kernel": conv_w(tconv), "bias": conv_b(tconv)}}, jnp.asarray(x)
    )
    out_t = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def test_conv_transpose_parity():
    """Our Upsample == torch ConvTranspose2d(k4, s2, p1) under the
    IOHW→flipped-HWIO weight mapping."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    tct = torch.nn.ConvTranspose2d(3, 3, 4, stride=2, padding=1)
    kern = tct.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
    up = Upsample(3)
    out_f = up.apply(
        {
            "params": {
                "conv": {
                    "kernel": jnp.asarray(np.ascontiguousarray(kern)),
                    "bias": conv_b(tct),
                }
            }
        },
        jnp.asarray(x),
    )
    out_t = tct(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    assert out_f.shape == out_t.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def test_sinusoidal_embedding_parity():
    """Matches the reference formula (parts/positional_encoding.py:6-18)."""
    t = jnp.array([0.0, 1.0, 17.0, 999.0])
    ours = np.asarray(SinusoidalPositionEmbeddings(32).apply({}, t))

    tt = torch.tensor([0.0, 1.0, 17.0, 999.0])
    half = 16
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half) * -emb)
    emb = tt[:, None] * emb[None, :]
    expected = torch.cat((emb.sin(), emb.cos()), dim=-1).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-4)


class TorchBlock(torch.nn.Module):
    """Replica of the reference Block (conv→GN→SiLU; parts/convnext.py:8-45)."""

    def __init__(self, dim, dim_out, groups):
        super().__init__()
        self.proj = torch.nn.Conv2d(dim, dim_out, 3, padding=1)
        self.norm = torch.nn.GroupNorm(groups, dim_out)

    def forward(self, x):
        return torch.nn.functional.silu(self.norm(self.proj(x)))


class TorchResnetBlock(torch.nn.Module):
    """Replica of the reference ResnetBlock (parts/convnext.py:63-86)."""

    def __init__(self, dim, dim_out, time_dim, groups):
        super().__init__()
        self.mlp = torch.nn.Linear(time_dim, dim_out)
        self.block1 = TorchBlock(dim, dim_out, groups)
        self.block2 = TorchBlock(dim_out, dim_out, groups)
        self.res_conv = torch.nn.Conv2d(dim, dim_out, 1)

    def forward(self, x, temb):
        h = self.block1(x)
        h = h + self.mlp(torch.nn.functional.silu(temb))[:, :, None, None]
        h = self.block2(h)
        return h + self.res_conv(x)


def test_resnet_block_parity():
    """Full ResnetBlock with transplanted weights: flax(NHWC) == torch(NCHW)."""
    rng = np.random.RandomState(2)
    dim, dim_out, time_dim, groups = 4, 6, 8, 2
    x = rng.randn(2, 5, 5, dim).astype(np.float32)
    temb = rng.randn(2, time_dim).astype(np.float32)

    tblock = TorchResnetBlock(dim, dim_out, time_dim, groups)
    tout = (
        tblock(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(temb))
        .detach()
        .permute(0, 2, 3, 1)
        .numpy()
    )

    params = {
        "block1": {
            "proj": {"kernel": conv_w(tblock.block1.proj), "bias": conv_b(tblock.block1.proj)},
            "norm": {
                "scale": jnp.asarray(tblock.block1.norm.weight.detach().numpy()),
                "bias": jnp.asarray(tblock.block1.norm.bias.detach().numpy()),
            },
        },
        "block2": {
            "proj": {"kernel": conv_w(tblock.block2.proj), "bias": conv_b(tblock.block2.proj)},
            "norm": {
                "scale": jnp.asarray(tblock.block2.norm.weight.detach().numpy()),
                "bias": jnp.asarray(tblock.block2.norm.bias.detach().numpy()),
            },
        },
        "mlp": {
            "kernel": jnp.asarray(tblock.mlp.weight.detach().numpy().T),
            "bias": jnp.asarray(tblock.mlp.bias.detach().numpy()),
        },
        "res_conv": {"kernel": conv_w(tblock.res_conv), "bias": conv_b(tblock.res_conv)},
    }
    fblock = ResnetBlock(dim_out, time_emb=True, groups=groups)
    fout = fblock.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(fout), tout, atol=2e-5)


def test_wavegrad_positional_encoding_parity():
    """Noise-level encoding matches the reference formula
    (parts/film.py:11-25: 5000·level·(1e-4^(i/half)), sin‖cos)."""
    from diffusion_model_nemo_tpu.modules.parts import PositionalEncoding

    level = jnp.array([[[[0.3]]], [[[0.9]]]]).reshape(2, 1, 1, 1)
    ours = np.asarray(PositionalEncoding(16).apply({}, level))  # [B,1,1,C]

    lv = torch.tensor([0.3, 0.9])
    half = 8
    exponents = 1e-4 ** (torch.arange(half, dtype=torch.float32) / half)
    exponents = 5000 * lv.unsqueeze(1) * exponents.unsqueeze(0)
    expected = torch.cat([exponents.sin(), exponents.cos()], dim=-1).numpy()
    np.testing.assert_allclose(ours[:, 0, 0, :], expected, rtol=1e-4, atol=1e-4)


def test_film_block_parity():
    """FeatureWiseLinearModulation vs a torch replica of the reference
    (parts/film.py:28-61): conv3x3+LeakyReLU(0.2) + PE -> scale/shift convs."""
    from diffusion_model_nemo_tpu.modules.parts import FeatureWiseLinearModulation

    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    level_np = np.array([0.25, 0.75], np.float32)

    sig = torch.nn.Conv2d(4, 4, 3, padding=1)
    sc = torch.nn.Conv2d(4, 6, 3, padding=1)
    sh = torch.nn.Conv2d(4, 6, 3, padding=1)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        h = torch.nn.functional.leaky_relu(sig(tx), 0.2)
        half = 2
        exponents = 1e-4 ** (torch.arange(half, dtype=torch.float32) / half)
        pe = 5000 * torch.from_numpy(level_np).unsqueeze(1) * exponents.unsqueeze(0)
        pe = torch.cat([pe.sin(), pe.cos()], dim=-1)  # [B, 4]
        h = h + pe[:, :, None, None]
        t_scale = sc(h).permute(0, 2, 3, 1).numpy()
        t_shift = sh(h).permute(0, 2, 3, 1).numpy()

    params = {
        "signal_conv": {"kernel": conv_w(sig), "bias": conv_b(sig)},
        "scale_conv": {"kernel": conv_w(sc), "bias": conv_b(sc)},
        "shift_conv": {"kernel": conv_w(sh), "bias": conv_b(sh)},
    }
    film = FeatureWiseLinearModulation(6)
    scale, shift = film.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(level_np).reshape(2, 1, 1, 1)
    )
    np.testing.assert_allclose(np.asarray(scale), t_scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(shift), t_shift, atol=2e-4)
