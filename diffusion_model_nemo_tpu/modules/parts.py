"""U-Net building blocks (Flax, NHWC).

TPU-native re-implementations of the reference's parts package:
- ``Block``/``ResnetBlock``/``ConvNextBlock`` — parts/convnext.py
- ``Attention``/``LinearAttention`` — parts/mha.py
- ``SinusoidalPositionEmbeddings`` — parts/positional_encoding.py
- ``PositionalEncoding``/``FeatureWiseLinearModulation`` — parts/film.py
- ``Residual``/``PreNorm``/``Upsample``/``Downsample`` — utils.py:68-93

All tensors are NHWC (channels-last) for TPU conv efficiency; GroupNorm uses
eps 1e-5 to match torch defaults.

Known reference bug handled here: the reference's ``Block`` runs
conv→norm→act for *both* declared orders ('conv_bn_act' and 'bn_act_conv');
the 'bn_act_conv' branch is dead code (parts/convnext.py:26-29). For
behavioral parity, both names run conv→norm→act by default; the corrected
pre-activation order is available as ``true_bn_act_conv``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "Block",
    "ResnetBlock",
    "ConvNextBlock",
    "Attention",
    "LinearAttention",
    "SinusoidalPositionEmbeddings",
    "PositionalEncoding",
    "FeatureWiseLinearModulation",
    "Residual",
    "PreNorm",
    "Upsample",
    "Downsample",
]

VALID_BLOCK_ORDERS = ("conv_bn_act", "bn_act_conv", "true_bn_act_conv")


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm → optional FiLM ``x·(scale+1)+shift`` → SiLU as one fused op.

    Owns the same ``scale``/``bias`` parameters as ``nn.GroupNorm`` (identical
    checkpoint layout) but runs the Pallas fused kernel on TPU
    (ops/norm.py); XLA fallback elsewhere — numerics match torch GroupNorm.
    """

    groups: int = 8
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        from ..ops.norm import group_norm_silu

        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_silu(
            x, gamma, beta, self.groups, self.epsilon, scale_shift=scale_shift
        ).astype(self.dtype)


class Block(nn.Module):
    """conv3×3 → GroupNorm → (optional FiLM scale/shift) → SiLU → dropout."""

    dim_out: int
    groups: int = 8
    dropout: Optional[float] = None
    order: str = "bn_act_conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None, *, deterministic: bool = True):
        if self.order not in VALID_BLOCK_ORDERS:
            raise ValueError(f"Valid ordering for block are : {VALID_BLOCK_ORDERS}")

        conv = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="proj")
        fused = FusedGroupNormSiLU(
            groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm"
        )

        def norm_film_act(h):
            return fused(h, scale_shift=scale_shift)

        if self.order == "true_bn_act_conv":
            x = norm_film_act(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            return conv(x)

        # conv_bn_act AND bn_act_conv both run conv→norm→act (reference bug
        # preserved for parity; see module docstring).
        x = conv(x)
        x = norm_film_act(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ResnetBlock(nn.Module):
    """Two Blocks with a time-embedding bias in between + residual 1×1.

    Reference parts/convnext.py:63-86.
    """

    dim_out: int
    time_emb: bool = True
    groups: int = 8
    order: str = "bn_act_conv"
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb: Optional[jnp.ndarray] = None, *, deterministic: bool = True):
        h = Block(self.dim_out, groups=self.groups, order=self.order, dtype=self.dtype, name="block1")(x)

        if self.time_emb and time_emb is not None:
            emb = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp")(nn.silu(time_emb))
            h = h + emb[:, None, None, :]

        h = Block(
            self.dim_out,
            groups=self.groups,
            order=self.order,
            dropout=self.dropout,
            dtype=self.dtype,
            name="block2",
        )(h, deterministic=deterministic)

        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class ConvNextBlock(nn.Module):
    """7×7 depthwise conv → time bias → GN(1)/conv/GELU/GN(1)/conv + residual.

    Reference parts/convnext.py:89-130.
    """

    dim_out: int
    time_emb: bool = True
    mult: int = 2
    norm: bool = True
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb: Optional[jnp.ndarray] = None, *, deterministic: bool = True):
        dim_in = x.shape[-1]
        h = nn.Conv(
            dim_in, (7, 7), padding=3, feature_group_count=dim_in, dtype=self.dtype, name="ds_conv"
        )(x)

        if self.time_emb and time_emb is not None:
            emb = nn.Dense(dim_in, dtype=self.dtype, name="mlp")(nn.gelu(time_emb))
            h = h + emb[:, None, None, :]

        if self.norm:
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="net_norm0")(h)
        h = nn.Conv(self.dim_out * self.mult, (3, 3), padding=1, dtype=self.dtype, name="net_conv0")(h)
        h = nn.gelu(h)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="net_norm1")(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="net_conv1")(h)

        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        if dim_in != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class Conv1x1(nn.Module):
    """1×1 convolution computed as a matmul over flattened tokens.

    Owns the identical parameters to ``nn.Conv(features, (1, 1))`` — kernel
    ``[1, 1, C, F]`` (+ bias ``[F]``) — so checkpoints and torch weight
    transplants are unchanged, but consumes/produces the ``[B, N, C]`` token
    view as a plain dot. On TPU this keeps the attention block in the default
    minor-to-major layout end to end: XLA's 1×1-conv emitter mandates a
    batch-in-sublanes output layout, which costs a full-tensor relayout copy
    (100 MB/step at the 32×32 level, 0.27 ms/step measured on v5e) right
    before the layout-native Pallas linear-attention call.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, N, C] → [B, N, features]
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, C, self.features), jnp.float32
        )
        y = jnp.dot(x.astype(self.dtype), kernel[0, 0].astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Attention(nn.Module):
    """Full softmax attention over flattened H·W tokens (bottleneck only).

    Reference parts/mha.py:7-30: qkv from a 1×1 no-bias conv, 4 heads × 32,
    max-subtracted softmax. Softmax accumulates in float32 on the MXU.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5

        qkv = Conv1x1(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(
            x.reshape(B, H * W, C)
        )
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, d]

        from ..ops.attention import fused_attention

        out = fused_attention(q * scale, k, v)  # Pallas on TPU, XLA fallback
        out = out.astype(x.dtype).reshape(B, H * W, hidden)
        out = Conv1x1(C, dtype=self.dtype, name="to_out")(out)
        return out.reshape(B, H, W, C)


class LinearAttention(nn.Module):
    """O(N) linear attention used at every resolution.

    Reference parts/mha.py:33-59: softmax over channel dim for q, spatial dim
    for k; ``context = k·vᵀ``, ``out = contextᵀ·q``; output 1×1 conv + GN(1).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head**-0.5

        from ..ops.attention import fused_linear_attention_tokens

        # Fused projection+attention (Pallas on TPU): qkv is computed in
        # VMEM per block of samples and never round-trips HBM — at the
        # 32×32 level the materialized qkv tensor is 100 MB/step and its
        # read back was the single most expensive op in the sampler profile
        # (ops/attention.py; falls back to the qkv-consuming kernel or the
        # XLA composition off-TPU). Same parameter tree as Conv1x1.
        w_qkv, _ = _Conv1x1Params(C, hidden * 3, use_bias=False, name="to_qkv")()
        out = fused_linear_attention_tokens(
            x.reshape(B, H * W, C).astype(self.dtype),
            w_qkv[0, 0],
            self.heads,
            self.dim_head,
            scale,
        )
        out = out.astype(x.dtype)

        out = Conv1x1(C, dtype=self.dtype, name="to_out")(out).reshape(B, H, W, C)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="out_norm")(out)


class SinusoidalPositionEmbeddings(nn.Module):
    """Transformer sinusoid on (integer or float) timestep, base 10000.

    Reference parts/positional_encoding.py:6-18.
    """

    dim: int

    @nn.compact
    def __call__(self, time):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = time.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class PositionalEncoding(nn.Module):
    """WaveGrad noise-level encoding: 5000·level·(1e-4^(i/half)), sin‖cos.

    Reference parts/film.py:11-25; returns a [B, 1, 1, C] broadcastable map
    (NHWC equivalent of the reference's [B, C, 1, 1]).
    """

    n_channels: int
    LINEAR_SCALE: float = 5000.0

    @nn.compact
    def __call__(self, noise_level):
        level = noise_level.reshape(noise_level.shape[0])  # [B]
        half_dim = self.n_channels // 2
        exponents = jnp.arange(half_dim, dtype=jnp.float32) / float(half_dim)
        exponents = 1e-4**exponents
        exponents = self.LINEAR_SCALE * level[:, None] * exponents[None, :]
        out = jnp.concatenate([jnp.sin(exponents), jnp.cos(exponents)], axis=-1)
        return out[:, None, None, :]


class FeatureWiseLinearModulation(nn.Module):
    """FiLM stats: conv3×3+LeakyReLU(0.2) + noise-level PE → scale/shift convs.

    Reference parts/film.py:28-61.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise_level):
        in_channels = x.shape[-1]
        h = nn.Conv(in_channels, (3, 3), padding=1, dtype=self.dtype, name="signal_conv")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = h + PositionalEncoding(in_channels, name="positional_encoding")(noise_level)
        scale = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="scale_conv")(h)
        shift = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="shift_conv")(h)
        return scale, shift


class Residual(nn.Module):
    fn: Callable

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return self.fn(x, *args, **kwargs) + x


class _GNParams(nn.Module):
    """Declares ``nn.GroupNorm``'s parameters (scale/bias) without computing —
    used to route them into a fused op while keeping the checkpoint tree."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return s, b


class _Conv1x1Params(nn.Module):
    """Declares ``Conv1x1``'s parameters (conv-shaped kernel [+ bias])."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class _AttnParams(nn.Module):
    """Declares ``Attention``'s parameter tree (to_qkv/to_out) for fused ops."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self):
        hidden = self.heads * self.dim_head
        w_qkv, _ = _Conv1x1Params(self.dim, hidden * 3, use_bias=False, name="to_qkv")()
        w_out, b_out = _Conv1x1Params(hidden, self.dim, name="to_out")()
        return w_qkv, w_out, b_out


class _LinAttnParams(nn.Module):
    """Declares ``LinearAttention``'s parameter tree (to_qkv/to_out/out_norm)."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self):
        hidden = self.heads * self.dim_head
        w_qkv, _ = _Conv1x1Params(self.dim, hidden * 3, use_bias=False, name="to_qkv")()
        w_out, b_out = _Conv1x1Params(hidden, self.dim, name="to_out")()
        og, ob = _GNParams(self.dim, name="out_norm")()
        return w_qkv, w_out, b_out, og, ob


class SelfAttentionBlock(nn.Module):
    """``Residual(PreNorm(Attention-or-LinearAttention))`` as one module.

    Composing module *instances* through Residual/PreNorm scatters their
    params across auto-named top-level collections in flax; this block owns
    its submodules so the param tree nests cleanly under the U-Net's
    ``{down,up,mid}_*_attn`` names.

    The linear variant can route the WHOLE block (both GroupNorms, both 1×1
    projections, attention, residual) through one fused op
    (ops/attention.py:fused_linear_attention_block) — **opt-in** via
    DMN_TPU_PALLAS_LINATTN_BLOCK=1. Measured on v5e at dim-32/B=128 the
    whole-block kernel LOSES to the composed path (57.6 vs 98.6 sps): at
    small N the per-element unrolled loop serializes, and at N=1024 the
    in-kernel f32 VPU work plus C=32 contractions underfill the MXU, while
    XLA pipelines the same chain across its own fusions. The composed path
    (XLA norms/projections + the layout-native Pallas qkv kernel) is the
    default; both paths share one parameter tree, so checkpoints and torch
    transplants are unaffected.
    """

    linear: bool = True
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        from ..ops.attention import use_packed_linattn_block

        B, H, W, C = x.shape
        if self.linear and use_packed_linattn_block(
            (B, H * W, C), jnp.dtype(self.dtype), self.heads, self.dim_head
        ):
            # Packed-lane whole-block kernel (ops/attention.py v5): the
            # dominant TPU route for the flagship's C=32/64 levels — both
            # XLA<->Pallas repack copies run unpadded and the prenorm,
            # projections, out-norm, and residual ride in VMEM. Fires only
            # when the Pallas dispatch holds, so the composed path below
            # (and its f32/CPU numerics) is untouched by default elsewhere.
            from ..ops.attention import fused_linear_attention_block_packed

            ng, nb = _GNParams(C, name="norm")()
            w_qkv, w_out, b_out, og, ob = _LinAttnParams(
                C, self.heads, self.dim_head, name="attn"
            )()
            out = fused_linear_attention_block_packed(
                x.reshape(B, H * W, C).astype(self.dtype),
                ng, nb, w_qkv[0, 0], w_out[0, 0], b_out, og, ob,
                self.heads, self.dim_head, self.dim_head**-0.5, 1e-5,
            )
            return out.reshape(B, H, W, C).astype(x.dtype)

        if not self.linear:
            from ..ops.attention import use_small_attn_block

            if use_small_attn_block(
                (B, H * W, C), jnp.dtype(self.dtype), self.heads, self.dim_head
            ):
                # Fused bottleneck-attention block (ops/attention.py): the
                # XLA per-head einsums at N=16 are ~77 us/step of layout
                # copies on v5e; the kernel expresses the head structure
                # with stacked masked operands instead.
                from ..ops.attention import fused_attention_block_small

                ng, nb = _GNParams(C, name="norm")()
                w_qkv, w_out, b_out = _AttnParams(
                    C, self.heads, self.dim_head, name="attn"
                )()
                out = fused_attention_block_small(
                    x.reshape(B, H * W, C).astype(self.dtype),
                    ng, nb, w_qkv[0, 0], w_out[0, 0], b_out,
                    self.heads, self.dim_head, self.dim_head**-0.5, 1e-5,
                )
                return out.reshape(B, H, W, C).astype(x.dtype)

        if self.linear and os.environ.get("DMN_TPU_PALLAS_LINATTN_BLOCK") == "1":
            from ..ops.attention import fused_linear_attention_block

            ng, nb = _GNParams(C, name="norm")()
            w_qkv, w_out, b_out, og, ob = _LinAttnParams(
                C, self.heads, self.dim_head, name="attn"
            )()
            out = fused_linear_attention_block(
                x.reshape(B, H * W, C).astype(self.dtype),
                ng, nb, w_qkv[0, 0], w_out[0, 0], b_out, og, ob,
                self.heads, self.dim_head, self.dim_head**-0.5, 1e-5,
            )
            return out.reshape(B, H, W, C)

        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        attn_cls = LinearAttention if self.linear else Attention
        h = attn_cls(heads=self.heads, dim_head=self.dim_head, dtype=self.dtype, name="attn")(h)
        return h + x


class PreNorm(nn.Module):
    """GroupNorm(1) before fn (reference utils.py:85-93)."""

    fn: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return self.fn(x)


class Downsample(nn.Module):
    """Strided conv k4 s2 p1 (reference utils.py:81-82)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (4, 4), strides=2, padding=1, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """ConvTranspose k4 s2 p1 → exact 2× (reference utils.py:77-78)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # flax ConvTranspose 'SAME' with kernel 4 / stride 2 produces the exact
        # 2x output size of torch ConvTranspose2d(k=4, s=2, p=1).
        return nn.ConvTranspose(
            self.dim, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype, name="conv"
        )(x)
