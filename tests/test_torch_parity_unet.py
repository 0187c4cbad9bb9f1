"""Full U-Net numerical parity vs a PyTorch replica with transplanted weights.

The torch model below replicates the reference network's architecture
(diffusion_model_nemo/modules/unet.py + parts/) exactly — stem, ResNet
blocks, linear attention at each level, full attention at the bottleneck,
time MLP, skip-concat ups, final head. All weights are transplanted into our
flax U-Net; outputs must agree to float32 tolerance. This is the end-to-end
evidence behind the loss-curve/FID-parity claim.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from diffusion_model_nemo_tpu.modules import Unet

# ---------------------------------------------------------------- torch side


class TSinusoid(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = t[:, None].float() * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TBlock(tnn.Module):
    def __init__(self, dim, dim_out, groups):
        super().__init__()
        self.proj = tnn.Conv2d(dim, dim_out, 3, padding=1)
        self.norm = tnn.GroupNorm(groups, dim_out)

    def forward(self, x):
        return tnn.functional.silu(self.norm(self.proj(x)))


class TResnetBlock(tnn.Module):
    def __init__(self, dim, dim_out, time_dim, groups):
        super().__init__()
        self.mlp = tnn.Linear(time_dim, dim_out)
        self.block1 = TBlock(dim, dim_out, groups)
        self.block2 = TBlock(dim_out, dim_out, groups)
        self.res_conv = tnn.Conv2d(dim, dim_out, 1) if dim != dim_out else tnn.Identity()

    def forward(self, x, temb):
        h = self.block1(x)
        h = h + self.mlp(tnn.functional.silu(temb))[:, :, None, None]
        h = self.block2(h)
        return h + self.res_conv(x)


class TLinearAttention(tnn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.scale = dim_head**-0.5
        self.heads = heads
        hidden = heads * dim_head
        self.to_qkv = tnn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = tnn.Conv2d(hidden, dim, 1)
        self.out_norm = tnn.GroupNorm(1, dim)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (
            t.reshape(b, self.heads, -1, h * w) for t in qkv
        )  # b h d n
        q = q.softmax(dim=-2) * self.scale
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        out = out.reshape(b, -1, h, w)
        return self.out_norm(self.to_out(out))


class TAttention(tnn.Module):
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
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhdj->bhid", attn, v)
        out = out.permute(0, 1, 3, 2).reshape(b, -1, h, w)
        return self.to_out(out)


class TPreNormResidual(tnn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = tnn.GroupNorm(1, dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x)) + x


class TUnet(tnn.Module):
    """Replica of reference Unet (ResNet path, dim_mults=(1, 2))."""

    def __init__(self, dim=8, channels=1, groups=4):
        super().__init__()
        self.init_conv = tnn.Conv2d(channels, dim, 7, padding=3)
        time_dim = dim * 4
        self.sinusoid = TSinusoid(dim)
        self.time_l0 = tnn.Linear(dim, time_dim)
        self.time_l1 = tnn.Linear(time_dim, time_dim)

        d0, d1 = dim, dim * 2
        # down level 0 (not last): blocks to d0... reference maps dim->dims[1]
        self.d0_b1 = TResnetBlock(dim, d0, time_dim, groups)
        self.d0_b2 = TResnetBlock(d0, d0, time_dim, groups)
        self.d0_attn = TPreNormResidual(d0, TLinearAttention(d0))
        self.d0_down = tnn.Conv2d(d0, d0, 4, stride=2, padding=1)
        # down level 1 (last): d0 -> d1
        self.d1_b1 = TResnetBlock(d0, d1, time_dim, groups)
        self.d1_b2 = TResnetBlock(d1, d1, time_dim, groups)
        self.d1_attn = TPreNormResidual(d1, TLinearAttention(d1))

        self.mid_b1 = TResnetBlock(d1, d1, time_dim, groups)
        self.mid_attn = TPreNormResidual(d1, TAttention(d1))
        self.mid_b2 = TResnetBlock(d1, d1, time_dim, groups)

        # up stage 0: cat(d1, skip d1) -> d0, then upsample
        self.u0_b1 = TResnetBlock(d1 * 2, d0, time_dim, groups)
        self.u0_b2 = TResnetBlock(d0, d0, time_dim, groups)
        self.u0_attn = TPreNormResidual(d0, TLinearAttention(d0))
        self.u0_up = tnn.ConvTranspose2d(d0, d0, 4, stride=2, padding=1)

        self.final_block = TResnetBlock(d0, dim, time_dim, groups)  # 8->8: res_conv is Identity
        self.final_norm = tnn.GroupNorm(groups, dim)
        self.final_conv = tnn.Conv2d(dim, channels, 1)

    def forward(self, x, t):
        x = self.init_conv(x)
        temb = self.time_l1(tnn.functional.gelu(self.time_l0(self.sinusoid(t))))

        h = []
        x = self.d0_b1(x, temb)
        x = self.d0_b2(x, temb)
        x = self.d0_attn(x)
        h.append(x)
        x = self.d0_down(x)

        x = self.d1_b1(x, temb)
        x = self.d1_b2(x, temb)
        x = self.d1_attn(x)
        h.append(x)

        x = self.mid_b1(x, temb)
        x = self.mid_attn(x)
        x = self.mid_b2(x, temb)

        x = torch.cat((x, h.pop()), dim=1)
        x = self.u0_b1(x, temb)
        x = self.u0_b2(x, temb)
        x = self.u0_attn(x)
        x = self.u0_up(x)

        # final block runs without time emb (reference passes None there)
        hh = self.final_block.block1(x)
        hh = self.final_block.block2(hh)
        x = hh + x  # dim == dim_out: identity residual
        x = tnn.functional.silu(self.final_norm(x))
        return self.final_conv(x)


# --------------------------------------------------------------- transplant


def cw(conv):
    return jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))


def cb(conv):
    return jnp.asarray(conv.bias.detach().numpy())


def lin(linear):
    return {
        "kernel": jnp.asarray(linear.weight.detach().numpy().T),
        "bias": jnp.asarray(linear.bias.detach().numpy()),
    }


def gn(norm):
    return {
        "scale": jnp.asarray(norm.weight.detach().numpy()),
        "bias": jnp.asarray(norm.bias.detach().numpy()),
    }


def resnet_params(tb, has_res_conv):
    p = {
        "block1": {"proj": {"kernel": cw(tb.block1.proj), "bias": cb(tb.block1.proj)},
                    "norm": gn(tb.block1.norm)},
        "block2": {"proj": {"kernel": cw(tb.block2.proj), "bias": cb(tb.block2.proj)},
                    "norm": gn(tb.block2.norm)},
        "mlp": lin(tb.mlp),
    }
    if has_res_conv:
        p["res_conv"] = {"kernel": cw(tb.res_conv), "bias": cb(tb.res_conv)}
    return p


def lin_attn_params(ta):
    return {
        "norm": gn(ta.norm),
        "attn": {
            "to_qkv": {"kernel": cw(ta.fn.to_qkv)},
            "to_out": {"kernel": cw(ta.fn.to_out), "bias": cb(ta.fn.to_out)},
            "out_norm": gn(ta.fn.out_norm),
        },
    }


def attn_params(ta):
    return {
        "norm": gn(ta.norm),
        "attn": {
            "to_qkv": {"kernel": cw(ta.fn.to_qkv)},
            "to_out": {"kernel": cw(ta.fn.to_out), "bias": cb(ta.fn.to_out)},
        },
    }


@pytest.mark.parametrize("seed", [0])
def test_full_unet_parity(seed):
    torch.manual_seed(seed)
    tnet = TUnet(dim=8, channels=1, groups=4).eval()

    fnet = Unet(
        dim=8,
        channels=1,
        dim_mults=[1, 2],
        use_convnext=False,
        resnet_block_groups=4,
    )

    params = {
        "init_conv": {"kernel": cw(tnet.init_conv), "bias": cb(tnet.init_conv)},
        "time_dense0": lin(tnet.time_l0),
        "time_dense1": lin(tnet.time_l1),
        "down_0_block1": resnet_params(tnet.d0_b1, has_res_conv=False),
        "down_0_block2": resnet_params(tnet.d0_b2, has_res_conv=False),
        "down_0_attn": lin_attn_params(tnet.d0_attn),
        "down_0_downsample": {"conv": {"kernel": cw(tnet.d0_down), "bias": cb(tnet.d0_down)}},
        "down_1_block1": resnet_params(tnet.d1_b1, has_res_conv=True),
        "down_1_block2": resnet_params(tnet.d1_b2, has_res_conv=False),
        "down_1_attn": lin_attn_params(tnet.d1_attn),
        "mid_block1": resnet_params(tnet.mid_b1, has_res_conv=False),
        "mid_attn": attn_params(tnet.mid_attn),
        "mid_block2": resnet_params(tnet.mid_b2, has_res_conv=False),
        "up_0_block1": resnet_params(tnet.u0_b1, has_res_conv=True),
        "up_0_block2": resnet_params(tnet.u0_b2, has_res_conv=False),
        "up_0_attn": lin_attn_params(tnet.u0_attn),
        "up_0_upsample": {
            "conv": {
                "kernel": jnp.asarray(
                    np.ascontiguousarray(
                        tnet.u0_up.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
                    )
                ),
                "bias": cb(tnet.u0_up),
            }
        },
        "final_block": {
            "block1": {
                "proj": {"kernel": cw(tnet.final_block.block1.proj), "bias": cb(tnet.final_block.block1.proj)},
                "norm": gn(tnet.final_block.block1.norm),
            },
            "block2": {
                "proj": {"kernel": cw(tnet.final_block.block2.proj), "bias": cb(tnet.final_block.block2.proj)},
                "norm": gn(tnet.final_block.block2.norm),
            },
        },
        "final_norm": gn(tnet.final_norm),
        "final_conv": {"kernel": cw(tnet.final_conv), "bias": cb(tnet.final_conv)},
    }

    rng = np.random.RandomState(seed)
    x = rng.randn(2, 8, 8, 1).astype(np.float32)
    t = np.array([7.0, 500.0], dtype=np.float32)

    # Sanity: the transplanted tree has the same leaves as a fresh init.
    ref_params = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))["params"]
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    fout = fnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        tout = (
            tnet(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(np.asarray(fout), tout, atol=5e-5)
