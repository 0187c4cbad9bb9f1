"""Text-conditional DDPM: sequence conditioning via DiT cross-attention.

Beyond the reference's surface (its only conditioning is a class label,
diffusion_model_nemo/models/conditional_ddpm.py) — this is the
text-to-image-shaped capability: the batch carries token sequences
(``tokens``), the backbone (a ``DiT`` with ``context_dim > 0``) embeds them
and cross-attends from every image token, and classifier-free guidance uses
a learned null context (the all-PAD row) exactly like ConditionalDDPM's
null class.

Offline-first: the built-in byte tokenizer (utils/text.ByteTokenizer) needs
no downloaded vocabulary; a float ``context`` from any external text encoder
[B, L, context_dim] works too (modules/dit.py accepts both). Training masks
~``cond_drop_prob`` of the captions to the null context inside the jitted
step (same recipe as ConditionalDDPM's 50% null-class mask, reference
conditional_ddpm.py:51-67, just over sequences).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from ..data.hf_vision_data import preprocess_batch
from ..utils.text import ByteTokenizer
from .ddpm import DDPM

__all__ = ["TextConditionalDDPM"]


@register_target("diffusion_model_nemo.models.TextConditionalDDPM")
class TextConditionalDDPM(DDPM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        net = self.cfg.diffusion_model
        if not int(net.get("context_dim", 0) or 0):
            raise ValueError(
                "TextConditionalDDPM needs diffusion_model.context_dim > 0 "
                "(a cross-attention backbone, e.g. the DiT)"
            )
        self.max_text_len = int(self.cfg.get("max_text_len", 32))
        self.cond_drop_prob = float(self.cfg.get("cond_drop_prob", 0.1))
        self.tokenizer = ByteTokenizer(self.max_text_len)
        if int(net.get("context_vocab", 0) or 0) not in (0, self.tokenizer.vocab_size):
            raise ValueError(
                f"diffusion_model.context_vocab must be "
                f"{self.tokenizer.vocab_size} (byte tokenizer) or 0 (external "
                f"float contexts); got {net.get('context_vocab')}"
            )

    # ---- plumbing ------------------------------------------------------------
    def _example_network_kwargs(self) -> Dict[str, Any]:
        kwargs = super()._example_network_kwargs()
        kwargs["context"] = jnp.zeros((1, self.max_text_len), jnp.int32)
        return kwargs

    def _tokens_array(
        self, batch_size: int, text: Union[None, str, Sequence[str]]
    ) -> jnp.ndarray:
        """Host-side tokenize → [B, max_text_len] int32. ``None`` = the null
        context (unconditional); one string broadcasts over the batch."""
        if text is None:
            return jnp.asarray(self.tokenizer.null(batch_size))
        if isinstance(text, str):
            return jnp.asarray(
                np.tile(self.tokenizer.encode(text)[None], (batch_size, 1))
            )
        if len(text) != batch_size:
            raise ValueError(f"{len(text)} prompts for batch_size={batch_size}")
        return jnp.asarray(self.tokenizer.encode_batch(list(text)))

    def get_model_fn(self, batch=None, training: bool = False, key=None):
        """Bind batch captions; in training randomly null-mask
        ~``cond_drop_prob`` of them (the CFG joint-training recipe —
        ConditionalDDPM's label masking over token sequences)."""
        k_mask = k_drop = None
        if training and key is not None:
            k_mask, k_drop = jax.random.split(key)
        if batch is None or "tokens" not in batch:
            return lambda params, x, t: self.model_fn(params, x, t, dropout_rng=k_drop)

        tokens = batch["tokens"].astype(jnp.int32)
        if training and k_mask is not None:
            drop = jax.random.bernoulli(k_mask, self.cond_drop_prob, (tokens.shape[0],))
            tokens = jnp.where(drop[:, None], 0, tokens)  # all-PAD = null context
        return lambda params, x, t: self.model_fn(
            params, x, t, context=tokens, dropout_rng=k_drop
        )

    def training_step(self, params, batch, key, step):
        k_pre, k_mask, k_t, k_noise = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        model_fn = self.get_model_fn(proc, training=True, key=k_mask)

        t = jax.random.randint(k_t, (B,), 0, self.timesteps, dtype=jnp.int32)
        noise = self._draw_noise(k_noise, samples)
        x_t = self.sampler.q_sample(x_start=samples, t=t, noise=noise)
        model_output = model_fn(params, x_t, t)

        if getattr(self.sampler, "objective", "pred_noise") == "pred_v":
            target = self.sampler.v_target(samples, t, noise)
        else:
            target = noise
        loss = self._simple_loss(model_output, target, t)
        return loss, {"train_loss": loss}

    # ---- inference -----------------------------------------------------------
    def _cfg_model_fn(self, tokens, null, guidance_scale: float):
        """Classifier-free-guided denoiser over text contexts: one 2B-batched
        network call per step (prompted + null rows), combined as
        eps = eps_null + w·(eps_text − eps_null). Same recipe and
        learned-variance convention as ConditionalDDPM._cfg_model_fn.
        ``null`` is usually the all-PAD null context; a NEGATIVE prompt's
        tokens work identically (guidance then pushes away from it — the
        standard negative-prompt recipe, a pure inference-time choice of
        the CFG anchor)."""
        w = float(guidance_scale)

        def model_fn(p, x, t):
            t = jnp.asarray(t)
            tt = jnp.concatenate([t, t]) if t.ndim == 1 else t
            out = self.model_fn(
                p,
                jnp.concatenate([x, x], axis=0),
                tt,
                context=jnp.concatenate([tokens, null], axis=0),
            )
            out_c, out_u = jnp.split(out, 2, axis=0)
            C = x.shape[-1]
            if out_c.shape[-1] == 2 * C:  # learned variance: guide eps only
                eps_c, var_c = jnp.split(out_c, 2, axis=-1)
                eps_u = jnp.split(out_u, 2, axis=-1)[0]
                return jnp.concatenate([eps_u + w * (eps_c - eps_u), var_c], axis=-1)
            return out_u + w * (out_c - out_u)

        return model_fn

    def sample(
        self,
        batch_size: int,
        image_size: int,
        key=None,
        text: Union[None, str, Sequence[str]] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        guidance_scale: Optional[float] = None,
        negative_text: Union[None, str, Sequence[str]] = None,
        context: Optional[np.ndarray] = None,
        **kwargs,
    ):
        """Prompted sampling; ``text=None`` samples unconditionally (null
        context). ``guidance_scale`` enables classifier-free guidance
        (requires a prompt; w=1 ≈ plain prompted, w>1 sharpens prompt
        adherence). ``negative_text`` replaces the null context as the CFG
        anchor (guidance pushes away from it — requires ``guidance_scale``).
        ``context`` feeds a precomputed float [B, L, context_dim] (or
        [L, context_dim], broadcast) sequence from an EXTERNAL text encoder
        instead of tokenizing ``text`` — mutually exclusive with the prompt
        arguments; guided external-context sampling anchors on the all-zeros
        context (the learned PAD-token null lives in the embedding table the
        float path bypasses). ``mesh``/``shard_axis`` shard like
        ``DDPM.sample``."""
        if context is not None:
            if text is not None or negative_text is not None:
                raise ValueError(
                    "context= replaces text prompts; pass either an external "
                    "float context or text/negative_text, not both"
                )
            ctx = jnp.asarray(context, jnp.float32)
            if ctx.ndim == 2:
                ctx = jnp.tile(ctx[None], (batch_size, 1, 1))
            if ctx.ndim != 3 or ctx.shape[0] != batch_size:
                raise ValueError(
                    f"context must be [B={batch_size}, L, D] or [L, D]; "
                    f"got {np.shape(context)}"
                )
            ctx_dim = int(self.cfg.diffusion_model.get("context_dim", 0) or 0)
            if ctx_dim and ctx.shape[-1] != ctx_dim:
                raise ValueError(
                    f"context feature dim {ctx.shape[-1]} != model "
                    f"context_dim {ctx_dim}"
                )
            tokens, neg_tokens = ctx, jnp.zeros_like(ctx)
        elif guidance_scale is not None and text is None:
            raise ValueError("guidance_scale requires a text prompt")
        if negative_text is not None and guidance_scale is None:
            raise ValueError("negative_text requires guidance_scale")
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        if context is None:
            tokens = self._tokens_array(batch_size, text)
            neg_tokens = self._tokens_array(batch_size, negative_text)
        sampler = self.sampler
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, tokens, neg_tokens, key):
                if guidance_scale is None:
                    model_fn = lambda p, x, t: self.model_fn(p, x, t, context=tokens)
                else:
                    model_fn = self._cfg_model_fn(tokens, neg_tokens, guidance_scale)
                return sampler.p_sample_loop(
                    model_fn, params, shape, key, return_frames=return_frames
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, frames_out = sample_shardings(mesh, shape, shard_axis, frames=True)
            out_shardings = (out, frames_out) if return_frames else out
            tok_sharding = NamedSharding(mesh, P("data") if shard_axis == "batch" else P())
            return jax.jit(
                fn,
                in_shardings=(rep, tok_sharding, tok_sharding, rep),
                out_shardings=out_shardings,
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "sample_text",
            build,
            shape,
            return_frames,
            mesh_cache_key(mesh),
            shard_axis,
            guidance_scale,
        )(params, tokens, neg_tokens, key)

    def interpolate(self, x1, x2, t=None, lambd=0.5, key=None, text=None, **kwargs):
        key = key if key is not None else jax.random.PRNGKey(0)
        tokens = self._tokens_array(x1.shape[0], text)
        sampler = self.sampler

        def build():
            def fn(params, x1, x2, tokens, key):
                model_fn = lambda p, x, tt: self.model_fn(p, x, tt, context=tokens)
                return sampler.interpolate(model_fn, params, x1, x2, key, t=t, lambd=lambd)

            return jax.jit(fn)

        return self._jitted("interp_text", build, x1.shape, t, lambd)(
            self.params, x1, x2, tokens, key
        )
