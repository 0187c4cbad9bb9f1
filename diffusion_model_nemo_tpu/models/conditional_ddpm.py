"""Class-conditional DDPM with CFG-style joint conditional/unconditional training.

Parity with the reference ConditionalDDPM
(diffusion_model_nemo/models/conditional_ddpm.py): requires ``num_classes``;
reserves the null-class index ``num_classes``; during training ~50% of labels
are randomly masked to the null class so one network jointly models both
modes; ``sample(label=…)`` generates class-conditionally or unconditionally.

TPU change: the label mask uses the jitted step's ``jax.random`` key (the
reference uses ``torch.randint`` on device per batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config.registry import register_target
from ..data.hf_vision_data import preprocess_batch
from .ddpm import DDPM

__all__ = ["ConditionalDDPM"]


@register_target("diffusion_model_nemo.models.ConditionalDDPM")
class ConditionalDDPM(DDPM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        if self.cfg.get("num_classes") is None:
            raise ValueError(
                "Conditional ddpm must have the `num_classes` value inside cfg.model !"
            )
        self.num_classes = int(self.cfg.num_classes)
        self.random_class_index = self.num_classes
        self.sampler.use_class_conditioning = True  # force set (reference :33)

    def model_fn(self, params, x, t, classes=None, dropout_rng=None):
        if classes is None and self.sampler.use_class_conditioning:
            classes = jnp.full((x.shape[0],), self.random_class_index, dtype=jnp.int32)
        return super().model_fn(params, x, t, classes=classes, dropout_rng=dropout_rng)

    def get_model_fn(self, batch=None, training: bool = False, key=None):
        """Bind labels; in training randomly null-mask ~50% of them
        (reference conditional_ddpm.py:51-67). ``key`` drives both the label
        mask and dropout when training."""
        k_mask = k_drop = None
        if training and key is not None:
            k_mask, k_drop = jax.random.split(key)
        if not self.sampler.use_class_conditioning or batch is None or "label" not in batch:
            return lambda params, x, t: self.model_fn(params, x, t, dropout_rng=k_drop)

        label = batch["label"].astype(jnp.int32)
        if training and k_mask is not None:
            mask = jax.random.bernoulli(k_mask, 0.5, label.shape)
            label = jnp.where(mask, self.random_class_index, label)
        return lambda params, x, t: self.model_fn(params, x, t, classes=label, dropout_rng=k_drop)

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

    def change_sampler(self, sampler_cfg) -> None:
        super().change_sampler(sampler_cfg)
        self.sampler.use_class_conditioning = True

    def _label_array(self, batch_size: int, label: Optional[int]) -> jnp.ndarray:
        if label is None:
            return jnp.full((batch_size,), self.random_class_index, dtype=jnp.int32)
        return jnp.full((batch_size,), int(label), dtype=jnp.int32)

    def _cfg_model_fn(self, labels, guidance_scale: float):
        """Classifier-free-guided denoiser: one 2B-batched network call per
        step (conditional + null rows concatenated — twice the FLOPs of a B
        call but one matmul stream, so the MXU stays filled) combined as
        eps = eps_uncond + w * (eps_cond - eps_uncond). w = 1 reduces to
        plain conditional sampling (up to fp rounding). BEYOND REFERENCE:
        the reference trains jointly conditional/unconditional
        (conditional_ddpm.py:57-67) which is exactly the CFG recipe, but
        never exploits it at sampling. With learned-variance outputs
        ([..., 2C]) guidance applies to the eps half and the variance comes
        from the conditional branch (the guided-diffusion convention)."""
        w = float(guidance_scale)
        null = jnp.full_like(labels, self.random_class_index)

        def model_fn(p, x, t):
            t = jnp.asarray(t)
            tt = jnp.concatenate([t, t]) if t.ndim == 1 else t
            out = self.model_fn(
                p,
                jnp.concatenate([x, x], axis=0),
                tt,
                classes=jnp.concatenate([labels, null], axis=0),
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
        label: Optional[int] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        guidance_scale: Optional[float] = None,
        **kwargs,
    ):
        """Class-conditional sampling; ``mesh``/``shard_axis`` shard the
        images over the ``data`` axis exactly like ``DDPM.sample`` (labels
        follow the batch split, or replicate under spatial sharding).
        ``guidance_scale`` enables classifier-free guidance (requires a
        class ``label``; w=1 ≈ conditional, w>1 sharpens class adherence)."""
        if guidance_scale is not None and label is None:
            raise ValueError("guidance_scale requires a class label")
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        labels = self._label_array(batch_size, label)
        sampler = self.sampler
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, labels, key):
                if guidance_scale is None:
                    model_fn = lambda p, x, t: self.model_fn(p, x, t, classes=labels)
                else:
                    model_fn = self._cfg_model_fn(labels, guidance_scale)
                return sampler.p_sample_loop(
                    model_fn, params, shape, key, return_frames=return_frames
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, frames_out = sample_shardings(mesh, shape, shard_axis, frames=True)
            out_shardings = (out, frames_out) if return_frames else out
            label_sharding = NamedSharding(mesh, P("data") if shard_axis == "batch" else P())
            return jax.jit(
                fn, in_shardings=(rep, label_sharding, rep), out_shardings=out_shardings
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "sample_cond",
            build,
            shape,
            return_frames,
            mesh_cache_key(mesh),
            shard_axis,
            guidance_scale,
        )(params, labels, key)

    def interpolate(self, x1, x2, t=None, lambd=0.5, key=None, label=None, **kwargs):
        key = key if key is not None else jax.random.PRNGKey(0)
        labels = self._label_array(x1.shape[0], label)
        sampler = self.sampler

        def build():
            def fn(params, x1, x2, labels, key):
                model_fn = lambda p, x, tt: self.model_fn(p, x, tt, classes=labels)
                return sampler.interpolate(model_fn, params, x1, x2, key, t=t, lambd=lambd)

            return jax.jit(fn)

        return self._jitted("interp_cond", build, x1.shape, t, lambd)(
            self.params, x1, x2, labels, key
        )
