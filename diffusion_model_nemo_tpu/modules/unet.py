"""2-D U-Net (Flax, NHWC) and the FiLM-conditioned WaveGrad variant.

Topology matches the reference Unet (diffusion_model_nemo/modules/unet.py:13-168):
7×7 stem; per down level [block, block, Residual(PreNorm(LinearAttention)),
Downsample]; mid [block, Residual(PreNorm(Attention)), block]; up levels with
skip-concat and ConvTranspose upsample; final block + GroupNorm/SiLU/1×1 conv;
optional learned variance (2× out channels) and class embedding added to the
stem feature map (padding row = null class embeds to zero, like torch's
``padding_idx``).

TPU-native design points: channels-last layout, configurable compute dtype
(bfloat16 matmuls with float32 params), no host-side control flow in
``__call__``.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_target
from .parts import (
    Attention,
    FusedGroupNormSiLU,
    SelfAttentionBlock,
    Block,
    ConvNextBlock,
    Downsample,
    FeatureWiseLinearModulation,
    LinearAttention,
    PreNorm,
    Residual,
    ResnetBlock,
    SinusoidalPositionEmbeddings,
    Upsample,
)

__all__ = ["Unet", "WaveGradUNet", "space_to_depth", "depth_to_space"]


def _resolve_dtype(dtype) -> jnp.dtype:
    if isinstance(dtype, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[dtype]
    return dtype


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/r, W/r, r·r·C]; inverse of ``depth_to_space``.

    Channel order: for coarse pixel (i, j), the output channels are the r·r
    sub-pixels in row-major order, each carrying its full C channels
    contiguously — so a channel-wise split of a depth_to_space result (e.g.
    the learned-variance (ε̂, v) chunk) sees ordinary [B, H, W, C] halves.
    """
    B, H, W, C = x.shape
    if H % r or W % r:
        raise ValueError(f"space_to_depth: H={H}, W={W} not divisible by r={r}")
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, h, w, r·r·C] → [B, h·r, w·r, C]; inverse of ``space_to_depth``."""
    B, h, w, rrC = x.shape
    C = rrC // (r * r)
    x = x.reshape(B, h, w, r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * r, w * r, C)


@register_target("diffusion_model_nemo.modules.Unet")
class Unet(nn.Module):
    """Reference-parity U-Net.

    Args mirror the reference constructor (unet.py:14-29); ``input_dim`` is
    accepted for config compatibility but unused (shapes are inferred).
    ``dtype`` is the TPU compute dtype (params stay float32).
    """

    dim: int
    input_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Optional[Sequence[int]] = None
    channels: int = 3
    with_time_emb: bool = True
    resnet_block_groups: int = 8
    use_convnext: bool = True
    convnext_mult: int = 2
    resnet_block_order: str = "bn_act_conv"
    dropout: Optional[float] = None
    learned_variance: bool = False
    num_classes: Optional[int] = None
    # Non-leaky augmentation conditioning (EDM-style, data/augment.py):
    # descriptor width of the applied-transform vector. A zero-initialized
    # no-bias Dense adds it to the time embedding, so a zero descriptor
    # (and a None one — Dense(0) == skip exactly) is the identity.
    aug_dim: int = 0
    dtype: str = "float32"
    remat: bool = False  # jax.checkpoint each block: trade FLOPs for HBM
    # TPU-geometry fast path (opt-in; default preserves reference numerics).
    # "s2d": space-to-depth the input 2×2 before the stem and depth-to-space
    # after the final conv — every U-Net level runs at half spatial
    # resolution, quartering the level-0 HBM traffic that bounds the dim-32
    # flagship (47.6 GFLOP forward at 18.6% MFU was memory-bound, STATUS r2).
    # This is a DIFFERENT architecture (stem sees 4·C input channels, final
    # conv emits 4·out_dim): weights are not transplantable from the parity
    # model and it must be trained with the flag on. Measured (v5e, B=128,
    # bf16): parity 100 sps → s2d 315.7 sps on the 1000-step DDPM chain.
    # "pad" (zero-padding 32-channel convs to wider MXU lanes) was measured
    # and rejected: tools/microbench_conv.py in-graph timing puts the L0
    # conv at 82.8 µs, its 64-channel padding at 123.9 µs (1.5× slower) and
    # its 128-channel padding at 278 µs (3.4× slower) — the extra FLOPs cost
    # more than the recovered lane utilization pays back.
    tpu_geometry: str = "off"

    def _geometry_factor(self) -> int:
        g = (self.tpu_geometry or "off").lower()
        if g in ("off", "none", ""):
            return 1
        if g in ("s2d", "space_to_depth", "s2d_hybrid"):
            return 2
        raise ValueError(
            f"Unknown tpu_geometry {self.tpu_geometry!r}; "
            "expected 'off', 's2d' or 's2d_hybrid'"
        )

    def _geometry_hybrid(self) -> bool:
        # "s2d_hybrid": depth-to-space BEFORE the final block instead of
        # after the final conv — the U-Net body runs at half resolution but
        # the final refinement block sees full-resolution pixels (its input
        # channels become dim/(r·r)). Restores pixel-level capacity the pure
        # s2d variant gives up, for a fraction of the throughput win.
        return (self.tpu_geometry or "").lower() == "s2d_hybrid"

    def _block(self, dim_out: int, dtype, name: str):
        if self.use_convnext:
            cls = ConvNextBlock
            kwargs = dict(
                time_emb=self.with_time_emb,
                mult=self.convnext_mult,
                dropout=self.dropout,
                dtype=dtype,
            )
        else:
            cls = ResnetBlock
            kwargs = dict(
                time_emb=self.with_time_emb,
                groups=self.resnet_block_groups,
                order=self.resnet_block_order,
                dropout=self.dropout,
                dtype=dtype,
            )
        if self.remat:
            cls = nn.remat(cls, static_argnums=())
        return cls(dim_out, name=name, **kwargs)

    def _dims(self) -> Tuple[List[int], List[Tuple[int, int]]]:
        dim_mults = tuple(self.dim_mults) if self.dim_mults is not None else (1, 2, 4, 8)
        dims = [self.dim] + [self.dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        return dims, in_out

    @nn.compact
    def __call__(self, x, time, classes=None, aug_cond=None, *, deterministic: bool = True):
        dtype = _resolve_dtype(self.dtype)
        dims, in_out = self._dims()
        num_resolutions = len(in_out)

        x = x.astype(dtype)
        r = self._geometry_factor()
        if r > 1:
            x = space_to_depth(x, r)
        x = nn.Conv(self.dim, (7, 7), padding=3, dtype=dtype, name="init_conv")(x)

        if self.num_classes is not None:
            if classes is None:
                classes = jnp.full((x.shape[0],), self.num_classes, dtype=jnp.int32)
            cls_embed = nn.Embed(self.num_classes + 1, self.dim, name="class_embed")(classes)
            # Null-class row behaves like torch padding_idx: always-zero output.
            cls_embed = jnp.where(
                (classes == self.num_classes)[:, None], 0.0, cls_embed
            ).astype(dtype)
            x = x + cls_embed[:, None, None, :]

        if self.with_time_emb:
            time_dim = self.dim * 4
            t = SinusoidalPositionEmbeddings(self.dim, name="time_sinusoid")(time)
            t = nn.Dense(time_dim, dtype=dtype, name="time_dense0")(t.astype(dtype))
            t = nn.gelu(t)
            t = nn.Dense(time_dim, dtype=dtype, name="time_dense1")(t)
            if self.aug_dim:
                # created unconditionally (param-tree stability); a None
                # descriptor feeds zeros, and no-bias Dense(0) == 0 exactly
                a = (
                    aug_cond
                    if aug_cond is not None
                    else jnp.zeros((t.shape[0], self.aug_dim))
                )
                t = t + nn.Dense(
                    time_dim,
                    use_bias=False,
                    kernel_init=nn.initializers.zeros,
                    dtype=dtype,
                    name="aug_embed",
                )(a.astype(dtype))
        else:
            t = None

        h = []
        for ind, (_dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= (num_resolutions - 1)
            x = self._block(dim_out, dtype, name=f"down_{ind}_block1")(x, t, deterministic=deterministic)
            x = self._block(dim_out, dtype, name=f"down_{ind}_block2")(x, t, deterministic=deterministic)
            x = SelfAttentionBlock(linear=True, dtype=dtype, name=f"down_{ind}_attn")(x)
            h.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=dtype, name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = self._block(mid_dim, dtype, name="mid_block1")(x, t, deterministic=deterministic)
        x = SelfAttentionBlock(linear=False, dtype=dtype, name="mid_attn")(x)
        x = self._block(mid_dim, dtype, name="mid_block2")(x, t, deterministic=deterministic)

        for ind, (dim_in, _dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= (num_resolutions - 1)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = self._block(dim_in, dtype, name=f"up_{ind}_block1")(x, t, deterministic=deterministic)
            x = self._block(dim_in, dtype, name=f"up_{ind}_block2")(x, t, deterministic=deterministic)
            x = SelfAttentionBlock(linear=True, dtype=dtype, name=f"up_{ind}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, dtype=dtype, name=f"up_{ind}_upsample")(x)

        default_out_dim = self.channels * (1 if not self.learned_variance else 2)
        out_dim = self.out_dim if self.out_dim is not None else default_out_dim

        hybrid = self._geometry_hybrid()
        if r > 1 and hybrid:
            x = depth_to_space(x, r)  # full-res refinement in the final block
        x = self._block(self.dim, dtype, name="final_block")(x, None, deterministic=deterministic)
        if self.resnet_block_order == "bn_act_conv":
            x = FusedGroupNormSiLU(
                groups=self.resnet_block_groups, epsilon=1e-5, dtype=dtype, name="final_norm"
            )(x)
        final_mult = 1 if (r == 1 or hybrid) else r * r
        out = nn.Conv(out_dim * final_mult, (1, 1), dtype=dtype, name="final_conv")(x)
        if r > 1 and not hybrid:
            out = depth_to_space(out, r)
        return out.astype(jnp.float32)


@register_target("diffusion_model_nemo.modules.WaveGradUNet")
class WaveGradUNet(Unet):
    """FiLM-conditioned U-Net; ``time`` input is the continuous noise level.

    Reference unet.py:171-266: one FiLM per level computing (scale, shift)
    from the pre-downsample feature map + noise-level positional encoding;
    stats collected on the way down and applied ``x·scale + shift`` after each
    upsample; stem stats applied ``scale·x + shift`` before the final conv.
    (The reference also constructs FiLMs for the up path that its forward
    never uses — those dead parameters are not created here.)
    """

    with_time_emb: bool = False  # FiLM replaces the time MLP

    @nn.compact
    def __call__(self, x, time, classes=None, *, deterministic: bool = True):
        noise_level = time
        dtype = _resolve_dtype(self.dtype)
        dims, in_out = self._dims()
        num_resolutions = len(in_out)

        x = x.astype(dtype)
        r = self._geometry_factor()
        if r > 1:
            x = space_to_depth(x, r)
        x = nn.Conv(self.dim, (7, 7), padding=3, dtype=dtype, name="init_conv")(x)

        statistics = []
        scale, shift = FeatureWiseLinearModulation(self.dim, dtype=dtype, name="film_0")(
            x, noise_level
        )
        statistics.append((scale, shift))

        if self.num_classes is not None:
            if classes is None:
                classes = jnp.full((x.shape[0],), self.num_classes, dtype=jnp.int32)
            cls_embed = nn.Embed(self.num_classes + 1, self.dim, name="class_embed")(classes)
            cls_embed = jnp.where(
                (classes == self.num_classes)[:, None], 0.0, cls_embed
            ).astype(dtype)
            x = x + cls_embed[:, None, None, :]

        h = []
        for ind, (_dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= (num_resolutions - 1)
            x = self._block(dim_out, dtype, name=f"down_{ind}_block1")(x, None, deterministic=deterministic)
            x = self._block(dim_out, dtype, name=f"down_{ind}_block2")(x, None, deterministic=deterministic)
            x = SelfAttentionBlock(linear=True, dtype=dtype, name=f"down_{ind}_attn")(x)
            h.append(x)
            scale, shift = FeatureWiseLinearModulation(
                dim_out, dtype=dtype, name=f"film_{ind + 1}"
            )(x, noise_level)
            if not is_last:
                x = Downsample(dim_out, dtype=dtype, name=f"down_{ind}_downsample")(x)
            statistics.append((scale, shift))

        mid_dim = dims[-1]
        x = self._block(mid_dim, dtype, name="mid_block1")(x, None, deterministic=deterministic)
        x = SelfAttentionBlock(linear=False, dtype=dtype, name="mid_attn")(x)
        x = self._block(mid_dim, dtype, name="mid_block2")(x, None, deterministic=deterministic)

        statistics.pop()  # deepest level's stats are unused (reference :249)

        for ind, (dim_in, _dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= (num_resolutions - 1)
            scale, shift = statistics.pop()
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = self._block(dim_in, dtype, name=f"up_{ind}_block1")(x, None, deterministic=deterministic)
            x = self._block(dim_in, dtype, name=f"up_{ind}_block2")(x, None, deterministic=deterministic)
            x = SelfAttentionBlock(linear=True, dtype=dtype, name=f"up_{ind}_attn")(x)
            if not is_last:
                x = Upsample(dim_in, dtype=dtype, name=f"up_{ind}_upsample")(x)
            x = x * scale + shift

        scale, shift = statistics.pop()  # stem stats
        x = scale * x + shift

        default_out_dim = self.channels * (1 if not self.learned_variance else 2)
        out_dim = self.out_dim if self.out_dim is not None else default_out_dim

        x = self._block(self.dim, dtype, name="final_block")(x, None, deterministic=deterministic)
        if self.resnet_block_order == "bn_act_conv":
            x = FusedGroupNormSiLU(
                groups=self.resnet_block_groups, epsilon=1e-5, dtype=dtype, name="final_norm"
            )(x)
        out = nn.Conv(out_dim * r * r, (1, 1), dtype=dtype, name="final_conv")(x)
        if r > 1:
            out = depth_to_space(out, r)
        return out.astype(jnp.float32)
