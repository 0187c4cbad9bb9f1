"""DiT — Diffusion Transformer backbone (Flax, NHWC tokens).

Beyond the reference's surface (its only network family is the conv U-Net,
diffusion_model_nemo/modules/unet.py:13-168). The DiT is a drop-in
``diffusion_model`` backbone with the identical call contract —
``__call__(x, time, classes=None, *, deterministic=True)``, NHWC in,
same-spatial-shape float32 out (2x channels under ``learned_variance``) —
so every model family (DDPM/ImprovedDDPM/Conditional/Latent/RectifiedFlow/
EDM/...), every sampler, distillation, LoRA, archives and serving work
unchanged by pointing ``model.diffusion_model._target_`` at
``diffusion_model_nemo.modules.DiT``.

Architecture follows Peebles & Xie 2023 ("Scalable Diffusion Models with
Transformers"): patchify stem, fixed 2-D sin-cos positional embeddings,
pre-LN transformer blocks conditioned via **adaLN-Zero** (per-block
shift/scale/gate regressed from the time(+class) embedding, zero-initialized
so every block starts as identity and the network output starts at exactly
zero), and a zero-initialized linear head unpatchified back to pixels.

TPU-native design points:

- The whole network is matmuls over ``[B, N, D]`` tokens — MXU-shaped work
  with none of the small-channel conv/layout issues the dim-32 U-Net fights;
  compute dtype configurable (bfloat16 matmuls, float32 params/softmax).
- The attention core reuses ``ops/attention.fused_attention`` (Pallas on
  TPU where the dispatch rules hold, XLA fallback elsewhere).
- Tensor-parallel sharding needs no annotations: every Dense kernel is
  ``(in, out)`` so the shape-driven strategy inference
  (parallel/sharding.py) splits output features over the ``model`` axis.
- The blocks are homogeneous by construction, which is what makes the
  pipeline-parallel stage stacking (parallel/pipeline.py) possible.
- Optional **mixture-of-experts** MLPs (``moe_experts > 0``) use
  expert-choice routing (Zhou et al. 2022): each expert picks its top-C
  tokens, so load is perfectly balanced *by construction* — no auxiliary
  loss to thread through the families' pure training steps — and routing is
  jit-static (fixed capacity). Expert weights are stacked ``[E, ...]``
  leaves, which the ``expert_parallel`` strategy shards over the ``expert``
  mesh axis.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import register_target
from .parts import SinusoidalPositionEmbeddings
from .unet import _resolve_dtype, depth_to_space

__all__ = ["DiT", "DiTBlock", "ExpertChoiceMoE", "sincos_position_embedding_2d"]


def _sincos_position_embedding_rows(
    h: int, w: int, dim: int, row_offset: jnp.ndarray
) -> jnp.ndarray:
    """jnp variant of :func:`sincos_position_embedding_2d` for a local block
    of ``h`` patch-rows starting at (traced) global row ``row_offset`` —
    used under sequence-parallel shard_map, where each device holds a
    contiguous row-major slice of the global token sequence."""
    if dim % 4:
        raise ValueError(f"DiT position embedding needs dim % 4 == 0, got {dim}")
    half = dim // 2
    quarter = half // 2
    freq = jnp.exp(-math.log(10000.0) * jnp.arange(quarter, dtype=jnp.float32) / quarter)

    def emb_1d(pos: jnp.ndarray) -> jnp.ndarray:  # [M] -> [M, half]
        ang = pos[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + row_offset.astype(jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.concatenate([emb_1d(gy.reshape(-1)), emb_1d(gx.reshape(-1))], axis=-1)


def sincos_position_embedding_1d(n: int, dim: int) -> np.ndarray:
    """Fixed 1-D sin‖cos positional table ``[n, dim]`` (base 10000) for the
    context token sequence. Host-side, static shapes — folds into the
    compiled graph as a constant."""
    if dim % 2:
        raise ValueError(f"1-D position embedding needs dim % 2 == 0, got {dim}")
    half = dim // 2
    freq = np.exp(-math.log(10000.0) * np.arange(half) / half)
    ang = np.arange(n, dtype=np.float64)[:, None] * freq[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def sincos_position_embedding_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2-D sin-cos positional table ``[h*w, dim]`` (DiT convention:
    half the channels encode the row coordinate, half the column; each half
    is a standard 1-D sin‖cos sinusoid, base 10000). Computed host-side once
    per trace (static shapes), so it folds into the compiled graph as a
    constant."""
    if dim % 4:
        raise ValueError(f"DiT position embedding needs dim % 4 == 0, got {dim}")
    half = dim // 2

    def emb_1d(pos: np.ndarray) -> np.ndarray:  # [M] -> [M, half]
        quarter = half // 2
        freq = np.exp(-math.log(10000.0) * np.arange(quarter) / quarter)
        ang = pos[:, None] * freq[None, :]
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)

    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    return np.concatenate([emb_1d(gy.reshape(-1)), emb_1d(gx.reshape(-1))], axis=-1).astype(np.float32)


class ExpertChoiceMoE(nn.Module):
    """Expert-choice-routed MoE MLP over ``[B, N, D]`` tokens.

    Each of E experts selects its own top-C tokens by router score
    (C = capacity_factor * B*N / E), computes a GELU MLP on them with its
    private weights, and scatters the gate-weighted outputs back. Tokens no
    expert picked pass through as zero (the caller's residual keeps them).
    Gradients reach the router through the combine gates; there is no
    load-balancing loss because expert choice balances exactly by
    construction.

    Expert weights are stacked on a leading ``[E, ...]`` axis — the
    ``expert_parallel`` strategy (parallel/sharding.py) shards that axis over
    the mesh's ``expert`` axis and XLA SPMD turns the gather/scatter into
    the dispatch/combine collectives.
    """

    dim: int
    hidden: int
    num_experts: int
    capacity_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        E = int(self.num_experts)
        T = B * N
        C = max(1, int(self.capacity_factor * T / E))

        xt = x.reshape(T, D)
        # Router scores in float32 (softmax stability); per-token distribution
        # over experts, transposed so each EXPERT ranks the tokens.
        logits = nn.Dense(E, dtype=jnp.float32, name="router")(xt.astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)  # [T, E]
        gates, idx = jax.lax.top_k(scores.T, C)  # [E, C] each

        w1 = self.param(
            "experts_w1",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (E, D, self.hidden),
            jnp.float32,
        )
        b1 = self.param("experts_b1", nn.initializers.zeros, (E, self.hidden), jnp.float32)
        w2 = self.param(
            "experts_w2",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (E, self.hidden, D),
            jnp.float32,
        )
        b2 = self.param("experts_b2", nn.initializers.zeros, (E, D), jnp.float32)

        xe = jnp.take(xt, idx, axis=0).astype(self.dtype)  # [E, C, D] dispatch
        h = jnp.einsum(
            "ecd,edf->ecf", xe, w1.astype(self.dtype), preferred_element_type=jnp.float32
        )
        h = nn.gelu(h.astype(self.dtype) + b1[:, None, :].astype(self.dtype))
        ye = jnp.einsum(
            "ecf,efd->ecd", h, w2.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype) + b2[:, None, :].astype(self.dtype)

        out = jnp.zeros((T, D), self.dtype)
        out = out.at[idx.reshape(-1)].add(
            (gates[..., None].astype(self.dtype) * ye).reshape(E * C, D)
        )
        return out.reshape(B, N, D)


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning.

    ``c`` ([B, D], the fused time+class embedding) regresses six modulation
    vectors through a zero-initialized Dense: (shift, scale, gate) for the
    attention branch and for the MLP branch. Zero init makes the block the
    identity at initialization.
    """

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: Optional[float] = None
    moe_experts: int = 0
    moe_capacity_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32
    seq_axis_name: Optional[str] = None  # ring attention over this mesh axis
    cross_attention: bool = False  # sequence conditioning (context tokens)

    @nn.compact
    def __call__(self, x, c, context=None, context_mask=None, *, deterministic: bool = True):
        D = self.dim
        if D % self.heads:
            raise ValueError(f"dim {D} not divisible by heads {self.heads}")
        head_dim = D // self.heads

        mod = nn.Dense(
            6 * D,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaln_mod",
        )(nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name=name
        )
        modulate = lambda h, sh, sc: h * (1.0 + sc[:, None, :]) + sh[:, None, :]

        # --- attention branch ------------------------------------------------
        h = modulate(ln("norm1")(x), sh1, sc1)
        B, N, _ = h.shape
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.seq_axis_name is not None:
            # sequence-parallel: tokens sharded over a mesh axis; K/V blocks
            # rotate around the ring with ppermute (parallel/ring_attention).
            from ..parallel.ring_attention import ring_attention_local

            attn = ring_attention_local(
                q * (head_dim**-0.5), k, v, self.seq_axis_name
            )
        else:
            from ..ops.attention import fused_attention

            attn = fused_attention(q * (head_dim**-0.5), k, v)  # Pallas on TPU
        attn = nn.Dense(D, dtype=self.dtype, name="attn_out")(
            attn.astype(h.dtype).reshape(B, N, D)
        )
        if self.dropout:
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = x + g1[:, None, :] * attn

        # --- cross-attention branch (sequence conditioning) -------------------
        # Standard text-to-image block order (self-attn -> cross-attn -> MLP):
        # queries from the image tokens, keys/values from the context
        # sequence; zero-initialized output projection makes the branch the
        # identity at init (matching the adaLN-Zero convention), so adding
        # context capability never perturbs an un-trained forward. Each query
        # is independent, so the branch is token-local and composes with
        # sequence parallelism (context replicated per shard).
        if self.cross_attention and context is not None:
            hca = ln("norm_ca")(x)
            q_ca = nn.Dense(D, dtype=self.dtype, name="ca_q")(hca)
            q_ca = q_ca.reshape(B, N, self.heads, head_dim)
            L = context.shape[1]
            kv = nn.Dense(2 * D, dtype=self.dtype, name="ca_kv")(
                context.astype(self.dtype)
            ).reshape(B, L, 2, self.heads, head_dim)
            k_ca, v_ca = kv[:, :, 0], kv[:, :, 1]
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q_ca, k_ca, preferred_element_type=jnp.float32
            ) * (head_dim ** -0.5)
            if context_mask is not None:
                # Finite mask value: softmax stays NaN-free even for rows
                # with a single valid token.
                logits = jnp.where(context_mask[:, None, None, :], logits, -1e9)
            w_ca = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            o_ca = jnp.einsum(
                "bhqk,bkhd->bqhd",
                w_ca.astype(self.dtype),
                v_ca,
                preferred_element_type=jnp.float32,
            )
            o_ca = nn.Dense(
                D,
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="ca_out",
            )(o_ca.astype(self.dtype).reshape(B, N, D))
            if self.dropout:
                o_ca = nn.Dropout(self.dropout, deterministic=deterministic)(o_ca)
            x = x + o_ca

        # --- MLP / MoE branch ------------------------------------------------
        h = modulate(ln("norm2")(x), sh2, sc2)
        hidden = int(D * self.mlp_ratio)
        if self.moe_experts > 0:
            h = ExpertChoiceMoE(
                dim=D,
                hidden=hidden,
                num_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype,
                name="moe",
            )(h)
        else:
            h = nn.Dense(hidden, dtype=self.dtype, name="mlp_in")(h)
            h = nn.gelu(h)
            h = nn.Dense(D, dtype=self.dtype, name="mlp_out")(h)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + g2[:, None, :] * h


@register_target(
    "diffusion_model_nemo.modules.DiT", "diffusion_model_nemo_tpu.modules.DiT"
)
class DiT(nn.Module):
    """Diffusion Transformer; drop-in for ``Unet`` in any model family.

    ``input_dim`` is accepted for config-surface compatibility with the
    U-Net YAMLs and unused (shapes are inferred). ``time`` may be the
    integer timestep (DDPM families), a continuous time (flow/SDE families)
    or a noise level — anything the sinusoid embeds.

    Class conditioning (``num_classes``) reserves index ``num_classes`` as
    the null class, like the rest of the zoo; unlike the U-Net's
    zeroed-padding-row parity behavior, the null row here is a *learned*
    embedding (the DiT paper's CFG convention — strictly more expressive,
    and nothing downstream depends on the null embedding being zero).

    ``moe_experts > 0`` swaps the MLP of every ``moe_every``-th block for an
    expert-choice MoE (see :class:`ExpertChoiceMoE`).
    """

    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 2
    channels: int = 3
    input_dim: Optional[int] = None  # config compat; unused
    out_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    time_freq_dim: int = 256
    dropout: Optional[float] = None
    learned_variance: bool = False
    num_classes: Optional[int] = None
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity_factor: float = 1.0
    # Non-leaky augmentation conditioning (EDM-style, data/augment.py):
    # zero-init no-bias Dense adds the applied-transform descriptor to the
    # conditioning vector c; None == zero descriptor exactly.
    aug_dim: int = 0
    # Sequence conditioning (text-to-image shaped): context_dim > 0 adds a
    # cross-attention branch to every block. ``context`` may be integer
    # tokens [B, L] (embedded in-module when context_vocab > 0; id 0 = PAD,
    # utils/text.ByteTokenizer convention) or pre-computed float embeddings
    # [B, L, context_dim] from an external encoder. context=None falls back
    # to the null context (a single PAD token — the learned unconditional
    # embedding classifier-free guidance trains).
    context_dim: int = 0
    context_vocab: int = 0
    dtype: str = "float32"
    remat: bool = False  # jax.checkpoint each block: trade FLOPs for HBM
    # Sequence parallelism: when set, __call__ expects the LOCAL shard of a
    # row-sharded image (run under shard_map with images split over this
    # mesh axis on dim 1) and uses ring attention over the axis. Use the
    # `sequence_parallel_dit_apply` helper (parallel/ring_attention.py).
    seq_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x, time, classes=None, aug_cond=None, context=None, *, deterministic: bool = True
    ):
        dtype = _resolve_dtype(self.dtype)
        B, H, W, Cin = x.shape
        p = int(self.patch_size)
        if H % p or W % p:
            raise ValueError(f"DiT: image {H}x{W} not divisible by patch_size {p}")
        h, w = H // p, W // p

        # Patchify: non-overlapping conv == Dense over p*p*Cin patches.
        tok = nn.Conv(
            self.dim, (p, p), strides=(p, p), padding="VALID", dtype=dtype, name="patch_embed"
        )(x.astype(dtype))
        tok = tok.reshape(B, h * w, self.dim)
        if self.seq_axis_name is not None:
            # Local shard of the row-major global sequence: offset the row
            # coordinate by this device's block start.
            row0 = jax.lax.axis_index(self.seq_axis_name) * h
            pos = _sincos_position_embedding_rows(h, w, self.dim, row0).astype(dtype)
        else:
            pos = jnp.asarray(sincos_position_embedding_2d(h, w, self.dim), dtype)
        tok = tok + pos[None]

        # Conditioning vector c = time embedding (+ class embedding).
        t = SinusoidalPositionEmbeddings(self.time_freq_dim, name="time_sinusoid")(
            jnp.asarray(time).reshape(-1)
        )
        t = nn.Dense(self.dim, dtype=dtype, name="time_dense0")(t.astype(dtype))
        t = nn.silu(t)
        c = nn.Dense(self.dim, dtype=dtype, name="time_dense1")(t)
        if self.num_classes is not None:
            if classes is None:
                classes = jnp.full((B,), self.num_classes, dtype=jnp.int32)
            c = c + nn.Embed(self.num_classes + 1, self.dim, name="class_embed")(
                classes
            ).astype(dtype)
        if self.aug_dim:
            a = (
                aug_cond
                if aug_cond is not None
                else jnp.zeros((c.shape[0], self.aug_dim))
            )
            c = c + nn.Dense(
                self.dim,
                use_bias=False,
                kernel_init=nn.initializers.zeros,
                dtype=dtype,
                name="aug_embed",
            )(a.astype(dtype))

        # Context sequence for cross-attention (text-to-image conditioning).
        ctx = ctx_mask = None
        if self.context_dim:
            if context is None:
                # Null context: one PAD token — the learned unconditional
                # embedding (requires in-module token embedding).
                if not self.context_vocab:
                    raise ValueError(
                        "DiT(context_dim>0, context_vocab=0) needs an explicit "
                        "float context [B, L, context_dim]"
                    )
                context = jnp.zeros((B, 1), jnp.int32)
            if jnp.issubdtype(context.dtype, jnp.integer):
                if not self.context_vocab:
                    raise ValueError("integer token context needs context_vocab > 0")
                # Position 0 is always attended: an all-PAD row attends to
                # exactly the PAD embedding (the CFG null context) instead of
                # an all-masked softmax.
                ctx_mask = (context != 0).at[:, 0].set(True)
                ctx = nn.Embed(
                    self.context_vocab, self.context_dim, name="context_embed"
                )(context)
                ctx = ctx + jnp.asarray(
                    sincos_position_embedding_1d(context.shape[1], self.context_dim)
                )[None]
            else:
                ctx = context
                ctx_mask = jnp.ones(context.shape[:2], bool)
            ctx = ctx.astype(dtype)

        block_cls = DiTBlock
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=())
        for i in range(self.depth):
            moe = self.moe_experts if (self.moe_experts and i % max(self.moe_every, 1) == 0) else 0
            blk = block_cls(
                dim=self.dim,
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                moe_experts=moe,
                moe_capacity_factor=self.moe_capacity_factor,
                dtype=dtype,
                seq_axis_name=self.seq_axis_name,
                cross_attention=bool(self.context_dim),
                name=f"block_{i}",
            )
            if self.context_dim:
                tok = blk(tok, c, ctx, ctx_mask, deterministic=deterministic)
            else:
                tok = blk(tok, c, deterministic=deterministic)

        default_out_dim = self.channels * (1 if not self.learned_variance else 2)
        out_dim = self.out_dim if self.out_dim is not None else default_out_dim

        # Final layer: adaLN modulate -> zero-init linear head -> unpatchify.
        mod = nn.Dense(
            2 * self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=dtype,
            name="final_mod",
        )(nn.silu(c))
        sh, sc = jnp.split(mod, 2, axis=-1)
        tok = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=dtype, name="final_norm"
        )(tok)
        tok = tok * (1.0 + sc[:, None, :]) + sh[:, None, :]
        out = nn.Dense(
            p * p * out_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=dtype,
            name="final_linear",
        )(tok)
        # [B, h, w, p*p*out_dim] -> [B, H, W, out_dim]; depth_to_space's
        # (p, p, C)-contiguous channel order means learned-variance consumers
        # see ordinary [.., out_dim] channel halves after unpatchify.
        out = depth_to_space(out.reshape(B, h, w, p * p * out_dim), p)
        return out.astype(jnp.float32)
