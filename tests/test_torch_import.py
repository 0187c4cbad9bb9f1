"""Reference-checkpoint importer (utils/torch_import.py + tools/import_torch_checkpoint.py).

The torch modules here replicate the reference's EXACT parameter layout —
``downs.N`` ModuleLists of [block1, block2, Residual(PreNorm(attn)),
down/upsample], ``time_mlp``/``mlp``/``to_out`` Sequential indices, the
``final_conv`` Sequential (reference modules/unet.py:41-121, parts/convnext.py,
parts/mha.py, utils.py:68-93) — because the state_dict KEYS are the interface
under test. Forward math mirrors the reference so imported weights can be
checked by output parity against our Flax U-Net, not just key bookkeeping.
"""

import math
import subprocess
import sys
import tarfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from diffusion_model_nemo_tpu.modules import Unet
from diffusion_model_nemo_tpu.utils.torch_import import (
    convert_unet_state_dict,
    strip_prefix,
)

IMG = 8


# ---- reference-layout torch replica -----------------------------------------
class RSinusoid(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = t[:, None].float() * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class RBlock(tnn.Module):
    def __init__(self, dim, dim_out, groups):
        super().__init__()
        self.proj = tnn.Conv2d(dim, dim_out, 3, padding=1)
        self.norm = tnn.GroupNorm(groups, dim_out)

    def forward(self, x):
        return tnn.functional.silu(self.norm(self.proj(x)))


class RResnetBlock(tnn.Module):
    """Reference parts/convnext.py ResnetBlock: mlp = Sequential(SiLU, Linear)."""

    def __init__(self, dim, dim_out, time_dim, groups):
        super().__init__()
        self.mlp = tnn.Sequential(tnn.SiLU(), tnn.Linear(time_dim, dim_out)) if time_dim else None
        self.block1 = RBlock(dim, dim_out, groups)
        self.block2 = RBlock(dim_out, dim_out, groups)
        self.res_conv = tnn.Conv2d(dim, dim_out, 1) if dim != dim_out else tnn.Identity()

    def forward(self, x, temb=None):
        h = self.block1(x)
        if self.mlp is not None and temb is not None:
            h = h + self.mlp(temb)[:, :, None, None]
        h = self.block2(h)
        return h + self.res_conv(x)


class RConvNextBlock(tnn.Module):
    """Reference ConvNextBlock: net = Sequential(GN, Conv, GELU, GN, Conv)."""

    def __init__(self, dim, dim_out, time_dim, mult=2):
        super().__init__()
        self.mlp = tnn.Sequential(tnn.GELU(), tnn.Linear(time_dim, dim)) if time_dim else None
        self.ds_conv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.net = tnn.Sequential(
            tnn.GroupNorm(1, dim),
            tnn.Conv2d(dim, dim_out * mult, 3, padding=1),
            tnn.GELU(),
            tnn.GroupNorm(1, dim_out * mult),
            tnn.Conv2d(dim_out * mult, dim_out, 3, padding=1),
        )
        self.res_conv = tnn.Conv2d(dim, dim_out, 1) if dim != dim_out else tnn.Identity()

    def forward(self, x, temb=None):
        h = self.ds_conv(x)
        if self.mlp is not None and temb is not None:
            h = h + self.mlp(temb)[:, :, None, None]
        h = self.net(h)
        return h + self.res_conv(x)


class RLinearAttention(tnn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads = heads
        hidden = heads * dim_head
        self.to_qkv = tnn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = tnn.Sequential(tnn.Conv2d(hidden, dim, 1), tnn.GroupNorm(1, dim))

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (t.reshape(b, self.heads, -1, h * w) for t in qkv)
        q = q.softmax(dim=-2) * self.scale
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        return self.to_out(out.reshape(b, -1, h, w))


class RAttention(tnn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads = heads
        hidden = heads * dim_head
        self.to_qkv = tnn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = tnn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (t.reshape(b, self.heads, -1, h * w) for t in qkv)
        q = q * self.scale
        sim = torch.einsum("bhdi,bhdj->bhij", q, k)
        sim = sim - sim.amax(dim=-1, keepdim=True).detach()
        out = torch.einsum("bhij,bhdj->bhid", sim.softmax(dim=-1), v)
        return self.to_out(out.permute(0, 1, 3, 2).reshape(b, -1, h, w))


class RPreNorm(tnn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = tnn.GroupNorm(1, dim)

    def forward(self, x):
        return self.fn(self.norm(x))


class RResidual(tnn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class RUnet(tnn.Module):
    """Key-faithful replica of the reference Unet (dim_mults=(1, 2))."""

    def __init__(self, dim=8, channels=1, groups=4, use_convnext=False, num_classes=None):
        super().__init__()
        self.init_conv = tnn.Conv2d(channels, dim, 7, padding=3)
        time_dim = dim * 4
        self.time_mlp = tnn.Sequential(
            RSinusoid(dim), tnn.Linear(dim, time_dim), tnn.GELU(), tnn.Linear(time_dim, time_dim)
        )

        def block(din, dout, tdim=time_dim):
            if use_convnext:
                return RConvNextBlock(din, dout, tdim)
            return RResnetBlock(din, dout, tdim, groups)

        d0, d1 = dim, dim * 2
        self.downs = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [block(dim, d0), block(d0, d0),
                     RResidual(RPreNorm(d0, RLinearAttention(d0))),
                     tnn.Conv2d(d0, d0, 4, stride=2, padding=1)]
                ),
                tnn.ModuleList(
                    [block(d0, d1), block(d1, d1),
                     RResidual(RPreNorm(d1, RLinearAttention(d1))),
                     tnn.Identity()]
                ),
            ]
        )
        self.mid_block1 = block(d1, d1)
        self.mid_attn = RResidual(RPreNorm(d1, RAttention(d1)))
        self.mid_block2 = block(d1, d1)
        self.ups = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [block(d1 * 2, d0), block(d0, d0),
                     RResidual(RPreNorm(d0, RLinearAttention(d0))),
                     tnn.ConvTranspose2d(d0, d0, 4, stride=2, padding=1)]
                )
            ]
        )
        # bn_act_conv order: Sequential(block, GN, SiLU, Conv) — unet.py:112-114
        # final block has NO time mlp (reference calls block_klass(dim, dim)
        # without time_emb_dim — unet.py:117)
        self.final_conv = tnn.Sequential(
            block(dim, dim, tdim=None), tnn.GroupNorm(groups, dim), tnn.SiLU(),
            tnn.Conv2d(dim, channels, 1)
        )
        self.num_classes = num_classes
        if num_classes is not None:
            self.class_embed = tnn.Embedding(num_classes + 1, dim, padding_idx=num_classes)

    def forward(self, x, t, classes=None):
        x = self.init_conv(x)
        if self.num_classes is not None:
            if classes is None:
                classes = torch.full((x.size(0),), self.num_classes, dtype=torch.long)
            x = x + self.class_embed(classes)[:, :, None, None]
        temb = self.time_mlp(t)
        h = []
        for b1, b2, attn, down in self.downs:
            x = b1(x, temb)
            x = b2(x, temb)
            x = attn(x)
            h.append(x)
            x = down(x)
        x = self.mid_block1(x, temb)
        x = self.mid_attn(x)
        x = self.mid_block2(x, temb)
        for b1, b2, attn, up in self.ups:
            x = torch.cat((x, h.pop()), dim=1)
            x = b1(x, temb)
            x = b2(x, temb)
            x = attn(x)
            x = up(x)
        return self._final(x)

    def _final(self, x):
        x = self.final_conv[0](x)  # block without temb
        for m in list(self.final_conv)[1:]:
            x = m(x)
        return x


def _our_unet(use_convnext=False, num_classes=None):
    return Unet(
        input_dim=IMG, dim=8, channels=1, dim_mults=(1, 2),
        use_convnext=use_convnext, resnet_block_groups=4, num_classes=num_classes,
    )


def _forward_parity(use_convnext, num_classes=None, classes=None, atol=2e-4):
    torch.manual_seed(0)
    tnet = RUnet(use_convnext=use_convnext, num_classes=num_classes).eval()
    net = _our_unet(use_convnext=use_convnext, num_classes=num_classes)
    args = (jnp.zeros((1, IMG, IMG, 1)), jnp.zeros((1,)))
    if num_classes is not None:
        template = net.init(jax.random.PRNGKey(0), *args, classes=jnp.zeros((1,), jnp.int32))["params"]
    else:
        template = net.init(jax.random.PRNGKey(0), *args)["params"]

    params = convert_unet_state_dict(
        tnet.state_dict(), template, use_convnext=use_convnext
    )

    x = np.random.default_rng(1).normal(size=(2, IMG, IMG, 1)).astype(np.float32)
    t = np.asarray([3.0, 7.0], np.float32)
    with torch.no_grad():
        kwargs = {}
        if classes is not None:
            kwargs["classes"] = torch.as_tensor(classes)
        ty = tnet(torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(t), **kwargs).numpy()
    jkwargs = {}
    if classes is not None:
        jkwargs["classes"] = jnp.asarray(classes)
    jy = np.asarray(
        net.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x), jnp.asarray(t), **jkwargs)
    )
    np.testing.assert_allclose(jy, np.moveaxis(ty, 1, -1), atol=atol)


def test_import_resnet_forward_parity():
    _forward_parity(use_convnext=False)


def test_import_convnext_forward_parity():
    # slightly looser: the 7x7 depthwise + GN(1) chain accumulates ~4e-4 of
    # f32 ordering noise on random weights
    _forward_parity(use_convnext=True, atol=6e-4)


def test_import_conditional_class_embed():
    _forward_parity(use_convnext=False, num_classes=3, classes=[1, 3])


def test_strip_prefix():
    sd = {"diffusion_model.a": 1, "diffusion_model.b": 2}
    assert set(strip_prefix(sd)) == {"a", "b"}
    mixed = {"diffusion_model.a": 1, "other": 2}
    assert set(strip_prefix(mixed)) == set(mixed)


def test_wrong_architecture_fails_loudly():
    torch.manual_seed(0)
    tnet = RUnet(use_convnext=False)
    net = _our_unet(use_convnext=True)  # mismatched: expects convnext keys
    template = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 1)), jnp.zeros((1,))
    )["params"]
    with pytest.raises(ValueError, match="import failed"):
        convert_unet_state_dict(tnet.state_dict(), template, use_convnext=True)


@pytest.mark.slow
def test_cli_nemo_archive_roundtrip(tmp_path):
    """.nemo tar (model_config.yaml + model_weights.ckpt) -> .dmn -> sample."""
    torch.manual_seed(0)
    tnet = RUnet(use_convnext=False)
    sd = {f"diffusion_model.{k}": v for k, v in tnet.state_dict().items()}
    wpath = tmp_path / "model_weights.ckpt"
    torch.save(sd, wpath)
    cfg = f"""
target: diffusion_model_nemo.models.ddpm.DDPM
image_size: {IMG}
timesteps: 5
channels: 1
save_every: 0
diffusion_model:
  _target_: diffusion_model_nemo.modules.Unet
  input_dim: {IMG}
  dim: 8
  channels: 1
  dim_mults: [1, 2]
  use_convnext: false
  resnet_block_groups: 4
sampler:
  _target_: diffusion_model_nemo.modules.GaussianDiffusion
  timesteps: 5
  schedule_name: linear
loss:
  _target_: diffusion_model_nemo.loss.DiffusionLoss
  loss_type: l2
optim:
  name: adamw
  lr: 0.001
"""
    (tmp_path / "model_config.yaml").write_text(cfg)
    nemo = tmp_path / "model.nemo"
    with tarfile.open(nemo, "w") as tar:
        tar.add(tmp_path / "model_config.yaml", arcname="model_config.yaml")
        tar.add(wpath, arcname="model_weights.ckpt")

    out = tmp_path / "imported.dmn"
    env_script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.argv = ['x', '--checkpoint', r'%s', '--output', r'%s']\n"
        "import runpy; runpy.run_path(r'%s', run_name='__main__')\n"
        % (nemo, out, Path(__file__).resolve().parents[1] / "tools" / "import_torch_checkpoint.py")
    )
    p = subprocess.run(
        [sys.executable, "-c", env_script],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert p.returncode == 0, p.stderr

    from diffusion_model_nemo_tpu.models import restore_model_from_archive

    model = restore_model_from_archive(str(out))
    imgs = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(0))
    assert imgs.shape == (2, IMG, IMG, 1)
    assert np.isfinite(np.asarray(imgs)).all()

    # weights actually came from torch: init_conv kernel matches exactly
    w = np.asarray(jax.tree.leaves({"k": model.params["init_conv"]["kernel"]})[0])
    tw = tnet.state_dict()["init_conv.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(w, tw)


# ---- WaveGrad FiLM variant ---------------------------------------------------
class RPositionalEncoding(tnn.Module):
    def __init__(self, n_channels):
        super().__init__()
        self.n_channels = n_channels

    def forward(self, noise_level):
        half = self.n_channels // 2
        exponents = torch.arange(half, dtype=torch.float32) / float(half)
        exponents = 1e-4 ** exponents
        exponents = 5000 * noise_level.unsqueeze(1) * exponents.unsqueeze(0)
        out = torch.cat([exponents.sin(), exponents.cos()], dim=-1)
        return out[:, :, None, None]


class RFiLM(tnn.Module):
    """Reference parts/film.py: signal_conv = Sequential(conv, LeakyReLU)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.signal_conv = tnn.Sequential(
            tnn.Conv2d(in_ch, in_ch, 3, padding=1), tnn.LeakyReLU(0.2)
        )
        self.positional_encoding = RPositionalEncoding(in_ch)
        self.scale_conv = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.shift_conv = tnn.Conv2d(in_ch, out_ch, 3, padding=1)

    def forward(self, x, noise_level):
        h = self.signal_conv(x) + self.positional_encoding(noise_level)
        return self.scale_conv(h), self.shift_conv(h)


class RWaveGradUNet(tnn.Module):
    """Key-faithful WaveGradUNet replica (dim_mults=(1, 2)): FiLM-conditioned,
    no time_mlp, INCLUDING the reference's dead up-path FiLMs
    (reference unet.py:204-210)."""

    def __init__(self, dim=8, channels=1, groups=4):
        super().__init__()
        self.init_conv = tnn.Conv2d(channels, dim, 7, padding=3)

        def block(din, dout):
            return RResnetBlock(din, dout, None, groups)

        d0, d1 = dim, dim * 2
        self.downs = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [block(dim, d0), block(d0, d0),
                     RResidual(RPreNorm(d0, RLinearAttention(d0))),
                     tnn.Conv2d(d0, d0, 4, stride=2, padding=1)]
                ),
                tnn.ModuleList(
                    [block(d0, d1), block(d1, d1),
                     RResidual(RPreNorm(d1, RLinearAttention(d1))),
                     tnn.Identity()]
                ),
            ]
        )
        self.mid_block1 = block(d1, d1)
        self.mid_attn = RResidual(RPreNorm(d1, RAttention(d1)))
        self.mid_block2 = block(d1, d1)
        self.ups = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [block(d1 * 2, d0), block(d0, d0),
                     RResidual(RPreNorm(d0, RLinearAttention(d0))),
                     tnn.ConvTranspose2d(d0, d0, 4, stride=2, padding=1)]
                )
            ]
        )
        self.final_conv = tnn.Sequential(
            block(dim, dim), tnn.GroupNorm(groups, dim), tnn.SiLU(),
            tnn.Conv2d(dim, channels, 1)
        )
        # films: stem + one per down level + DEAD up-path films
        films = [RFiLM(dim, dim), RFiLM(d0, d0), RFiLM(d1, d1)]
        films.append(RFiLM(d1, d1))  # dead up-path film (reference :207-209)
        self.films = tnn.ModuleList(films)

    def forward(self, x, noise_level):
        x = self.init_conv(x)
        statistics = [self.films[0](x, noise_level)]
        h = []
        for i, (b1, b2, attn, down) in enumerate(self.downs):
            x = b1(x)
            x = b2(x)
            x = attn(x)
            h.append(x)
            statistics.append(self.films[i + 1](x, noise_level))
            x = down(x)
        x = self.mid_block1(x)
        x = self.mid_attn(x)
        x = self.mid_block2(x)
        statistics.pop()  # deepest stats discarded (reference :249)
        for b1, b2, attn, up in self.ups:
            scale, shift = statistics.pop()
            x = torch.cat((x, h.pop()), dim=1)
            x = b1(x)
            x = b2(x)
            x = attn(x)
            x = up(x)
            x = x * scale + shift
        scale, shift = statistics.pop()
        x = scale * x + shift
        return self._final(x)

    def _final(self, x):
        x = self.final_conv[0](x)
        for m in list(self.final_conv)[1:]:
            x = m(x)
        return x


def test_import_wavegrad_film_forward_parity():
    from diffusion_model_nemo_tpu.modules import WaveGradUNet

    torch.manual_seed(0)
    tnet = RWaveGradUNet().eval()
    net = WaveGradUNet(
        input_dim=IMG, dim=8, channels=1, dim_mults=(1, 2),
        use_convnext=False, resnet_block_groups=4,
    )
    template = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 1)), jnp.full((1,), 0.5)
    )["params"]

    # dead films present in the torch dict must fail without the waiver...
    with pytest.raises(ValueError, match="unconsumed"):
        convert_unet_state_dict(tnet.state_dict(), template)
    # ...and convert cleanly with it
    params = convert_unet_state_dict(
        tnet.state_dict(), template, drop_dead_films=True
    )

    x = np.random.default_rng(2).normal(size=(2, IMG, IMG, 1)).astype(np.float32)
    lvl = np.asarray([0.3, 0.8], np.float32)
    with torch.no_grad():
        ty = tnet(torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(lvl)).numpy()
    jy = np.asarray(
        net.apply({"params": jax.tree.map(jnp.asarray, params)},
                  jnp.asarray(x), jnp.asarray(lvl))
    )
    np.testing.assert_allclose(jy, np.moveaxis(ty, 1, -1), atol=2e-4)
