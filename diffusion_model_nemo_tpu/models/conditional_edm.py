"""Class-conditional EDM with CFG-style joint conditional/unconditional
training (beyond the reference's model surface — the reference's only
conditional family is the discrete-time ConditionalDDPM,
diffusion_model_nemo/models/conditional_ddpm.py, whose conventions this
mirrors: required ``num_classes``, reserved null-class index ``num_classes``,
~50% of training labels randomly masked to the null class so one network
jointly models both modes).

Guidance composes linearly everywhere in EDM: the network output F, the
denoiser D = c_skip*x + c_out*F, and the probability-flow slope (x - D)/sigma
are all affine in F, so classifier-free guidance applied to the RAW network
output (one 2B-batched call per evaluation: F_u + w*(F_c - F_u)) is exactly
guidance on the score. ``sample(label=..., guidance_scale=w)`` rides the same
fused Heun/Euler scan as the base family.

Per-batch labels are explicit jit ARGUMENTS (via EDM._bind_classes), never
closure captures — `_jitted`-cached eval/NLL graphs stay valid across
batches with different labels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config.registry import register_target
from ..data.hf_vision_data import preprocess_batch
from .edm import EDM

__all__ = ["ConditionalEDM"]


@register_target(
    "diffusion_model_nemo.models.ConditionalEDM",
    "diffusion_model_nemo_tpu.models.ConditionalEDM",
)
class ConditionalEDM(EDM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        if self.cfg.get("num_classes") is None:
            raise ValueError(
                "Conditional EDM must have the `num_classes` value inside cfg.model !"
            )
        self.num_classes = int(self.cfg.num_classes)
        self.random_class_index = self.num_classes
        # fraction of training labels masked to the null class (the CFG
        # recipe; ConditionalDDPM hard-codes the reference's 0.5)
        self.cond_drop_prob = float(self.cfg.get("cond_drop_prob", 0.5))

    # ---- conditioning plumbing --------------------------------------------------
    def model_fn(self, params, x, t, classes=None, dropout_rng=None, aug_cond=None):
        """Unlabelled calls run as the null class (the jointly-trained
        unconditional mode), so every inherited EDM surface — sampling,
        encode, interpolate, unlabelled NLL — works unconditioned."""
        if classes is None:
            classes = jnp.full((x.shape[0],), self.random_class_index, dtype=jnp.int32)
        return super().model_fn(
            params, x, t, classes=classes, dropout_rng=dropout_rng, aug_cond=aug_cond
        )

    def _bind_classes(self, labels):
        if labels is None:
            return lambda params, x, t: self.model_fn(params, x, t)
        return lambda params, x, t: self.model_fn(
            params, x, t, classes=jnp.broadcast_to(labels, (x.shape[0],))
        )

    def get_model_fn(self, batch=None, training: bool = False, key=None, aug_cond=None):
        """Bind batch labels; in training randomly null-mask
        ``cond_drop_prob`` of them (the ConditionalDDPM recipe —
        conditional_ddpm.py:51-67 in the reference). ``key`` drives both the
        label mask and dropout when training."""
        k_mask = k_drop = None
        if training and key is not None:
            k_mask, k_drop = jax.random.split(key)
        if batch is None or "label" not in batch:
            return lambda params, x, t: self.model_fn(
                params, x, t, dropout_rng=k_drop, aug_cond=aug_cond
            )
        label = batch["label"].astype(jnp.int32)
        if training and k_mask is not None:
            mask = jax.random.bernoulli(k_mask, self.cond_drop_prob, label.shape)
            label = jnp.where(mask, self.random_class_index, label)
        return lambda params, x, t: self.model_fn(
            params, x, t, classes=label, dropout_rng=k_drop, aug_cond=aug_cond
        )

    # ---- guided sampling ---------------------------------------------------------
    def _label_array(self, batch_size: int, label: Optional[int]) -> jnp.ndarray:
        if label is None:
            return jnp.full((batch_size,), self.random_class_index, dtype=jnp.int32)
        if not (0 <= int(label) < self.num_classes):
            raise ValueError(
                f"label must be in [0, {self.num_classes}), got {label}"
            )
        return jnp.full((batch_size,), int(label), dtype=jnp.int32)

    def _cfg_model_fn(self, labels, guidance_scale: float):
        """Classifier-free-guided network: one 2B-batched call per denoiser
        evaluation (conditional + null rows concatenated — the MXU stays
        filled), combined on the raw output: F = F_u + w*(F_c - F_u). D and
        the ODE slope are affine in F, so this IS score-space guidance.
        w = 1 reduces to plain conditional sampling (up to fp rounding)."""
        w = float(guidance_scale)
        null = jnp.full_like(labels, self.random_class_index)

        def model_fn(params, x, t):
            t = jnp.asarray(t)
            tt = jnp.concatenate([t, t]) if t.ndim == 1 else t
            out = super(ConditionalEDM, self).model_fn(
                params,
                jnp.concatenate([x, x], axis=0),
                tt,
                classes=jnp.concatenate([labels, null], axis=0),
            )
            out_c, out_u = jnp.split(out, 2, axis=0)
            return out_u + w * (out_c - out_u)

        return model_fn

    def sample(
        self,
        batch_size: int,
        image_size: int,
        key: Optional[jax.Array] = None,
        label: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        **kwargs,
    ):
        """Class-conditional Algorithm-2 sampling; ``label=None`` samples the
        null class (unconditional mode). ``guidance_scale=w`` applies
        classifier-free guidance (requires ``label``); each distinct
        (label, w) is its own cached jit graph."""
        labels = self._label_array(batch_size, label)
        if guidance_scale is not None:
            if label is None:
                raise ValueError("guidance_scale requires label= (a class to guide toward)")
            model_fn = self._cfg_model_fn(labels, guidance_scale)
            tag = ("cfg", int(label), float(guidance_scale))
        else:
            model_fn = self._bind_classes(labels)
            tag = ("label", -1 if label is None else int(label))
        return super().sample(
            batch_size, image_size, key=key, model_fn=model_fn, cache_tag=tag,
            **kwargs,
        )
