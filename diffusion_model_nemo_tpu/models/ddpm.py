"""DDPM model: vanilla denoising-diffusion training + sampling services.

Parity with the reference DDPM (diffusion_model_nemo/models/ddpm.py):
uniform t, ``q_sample`` noising, noise-prediction loss, periodic sample
dumps + optional bits/dim; ``test_step``/``test_epoch_end`` aggregate
dataset-level bits/dim. The training step is a pure function the Trainer
jits over the mesh; sampling is a cached jit of the sampler's fused scan.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate, register_target
from ..data.hf_vision_data import preprocess_batch
from ..utils import logging
from .abstract_diffusion_model import AbstractDiffusionModel

__all__ = ["DDPM"]


@register_target("diffusion_model_nemo.models.DDPM")
class DDPM(AbstractDiffusionModel):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.diffusion_model = self.build_network()
        self.sampler = instantiate(self.cfg.sampler)
        self.loss = instantiate(self.cfg.loss)

    # ---- training ------------------------------------------------------------
    def _draw_noise(self, k_noise, samples) -> jnp.ndarray:
        """Training noise draw; ``model.offset_noise_strength: s`` (beyond
        reference — the common low-frequency/brightness fine-tuning knob)
        adds s·N(0,1) per (example, channel), constant over space. The base
        stream comes from ``k_noise`` untouched, so s = 0 is bitwise the
        previous behavior (repo key-stream contract)."""
        noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
        strength = float(self.cfg.get("offset_noise_strength", 0.0) or 0.0)
        if strength:
            offset = jax.random.normal(
                jax.random.fold_in(k_noise, 1),
                (samples.shape[0],) + (1,) * (samples.ndim - 2) + (samples.shape[-1],),
                samples.dtype,
            )
            noise = noise + strength * offset
        return noise

    def _simple_loss(self, model_output, target, t) -> jnp.ndarray:
        """L_simple, optionally Min-SNR-γ-weighted (``model.snr_gamma: γ``,
        Hang et al. 2023 — beyond reference). The weighted path uses the
        paper's convention (per-example mean, weighted, batch mean)
        regardless of ``loss.reduction``; γ unset keeps the configured
        reduction exactly (reference parity)."""
        gamma = self.cfg.get("snr_gamma")
        if not gamma:
            return self.loss(input=model_output, target=target)
        per = self.loss.elementwise(model_output, target)
        per = per.reshape(per.shape[0], -1).mean(-1)
        w = self.sampler.min_snr_weight(t, float(gamma))
        return (w * per).mean()

    def training_step(self, params, batch, key, step):
        """Pure: (params, raw uint8 batch, key, step) → (loss, metrics).

        Algorithm 1 of DDPM (reference ddpm.py:43-77) with on-device
        preprocessing fused in.
        """
        k_pre, k_t, k_noise, k_drop = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        model_fn = self.get_model_fn(proc, training=True, key=k_drop)

        t = jax.random.randint(k_t, (B,), 0, self.timesteps, dtype=jnp.int32)
        noise = self._draw_noise(k_noise, samples)
        x_t = self.sampler.q_sample(x_start=samples, t=t, noise=noise)
        model_output = model_fn(params, x_t, t)

        # Reference parity: the loss targets the true noise (ddpm.py:57) for
        # pred_noise AND pred_x0 alike. pred_v (beyond-reference) targets the
        # exact v for the drawn (x0, t, eps) triple.
        if getattr(self.sampler, "objective", "pred_noise") == "pred_v":
            target = self.sampler.v_target(samples, t, noise)
        else:
            target = noise
        loss = self._simple_loss(model_output, target, t)
        metrics = {"train_loss": loss}
        return loss, metrics

    # ---- evaluation -----------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        proc = preprocess_batch(
            jax.tree.map(jnp.asarray, batch), key=None, train=False
        )
        samples = proc["pixel_values"]
        model_fn = self.get_model_fn(proc)
        log_dict = self.calculate_bits_per_dimension(
            x_start=samples, key=key, max_batch_size=-1, model_fn=model_fn
        )
        out = {k: v.sum() for k, v in log_dict.items()}
        out["num_samples"] = jnp.asarray(samples.shape[0], jnp.int32)
        return out

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        result = {
            "test_total_bpd": float(sum(np.asarray(o["total_bpd"]) for o in outputs)) / total,
            "test_terms_bpd": float(sum(np.asarray(o["terms_bpd"]) for o in outputs)) / total,
            "test_prior_bpd": float(sum(np.asarray(o["prior_bpd"]) for o in outputs)) / total,
        }
        logging.info(f"Test bits/dim: {result}")
        return result

    # ---- inference services ------------------------------------------------------
    def sample(
        self,
        batch_size: int,
        image_size: int,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        **kwargs,
    ):
        """Cached-jit fused sampling scan; returns [B, H, W, C] in [0, 1].

        With ``mesh`` the images are sharded over the mesh's ``data`` axis
        (params replicated) — sampling scales across chips with zero code
        change to the scan (XLA partitions the loop body). ``shard_axis``
        picks the split: ``"batch"`` (default — throughput for many images)
        or ``"spatial"`` (rows of H split across chips; XLA SPMD inserts the
        conv halo exchanges) for the few-large-images regime where one
        chip's HBM cannot hold the batch=1 activations.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        model_fn = self.get_model_fn()
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, key):
                return sampler.p_sample_loop(
                    model_fn, params, shape, key, return_frames=return_frames
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, frames_out = sample_shardings(mesh, shape, shard_axis, frames=True)
            out_shardings = (out, frames_out) if return_frames else out
            return jax.jit(fn, in_shardings=(rep, rep), out_shardings=out_shardings)

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "sample", build, shape, return_frames, mesh_cache_key(mesh), shard_axis
        )(params, key)

    def inpaint(
        self,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        jump_length: int = 10,
        jump_n_sample: int = 10,
        mesh=None,
        shard_axis: str = "batch",
    ):
        """RePaint mask-conditioned generation (Lugmayr et al. 2022) — fill
        the ``mask == 0`` region of ``known`` with any trained DDPM-family
        model, no retraining (modules/repaint.py; beyond the reference's
        sampling surface).

        Args:
            known: [B, H, W, C] images in [0, 1] display space.
            mask: broadcastable to ``known``; 1 = keep pixel, 0 = generate.
            jump_length / jump_n_sample: RePaint time-travel resampling
                (``jump_n_sample=1`` disables it — plain blended reverse
                chain). NFE ≈ timesteps * jump_n_sample.

        Returns [B, H, W, C] in [0, 1]; the known region is exact.
        """
        from ..modules.gaussian_diffusion import GaussianDiffusion
        from ..modules.repaint import repaint_loop

        if not isinstance(self.sampler, GaussianDiffusion):
            raise ValueError(
                "inpaint requires a GaussianDiffusion-family sampler (got "
                f"{type(self.sampler).__name__}); RePaint blends the ancestral chain"
            )
        assert known.ndim == 4, f"known is not a batch of images: {known.shape}"
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = tuple(known.shape)
        model_fn = self.get_model_fn()
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, known, mask, key):
                return repaint_loop(
                    sampler, model_fn, params, known * 2.0 - 1.0, mask, key,
                    jump_length=jump_length, jump_n_sample=jump_n_sample,
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, _ = sample_shardings(mesh, shape, shard_axis, frames=True)
            return jax.jit(
                fn, in_shardings=(rep, out, out, rep), out_shardings=out
            )

        params = self.ema_params if use_ema else self.params
        mask = jnp.broadcast_to(jnp.asarray(mask, jnp.float32), shape)
        return self._jitted(
            "inpaint", build, shape, jump_length, jump_n_sample,
            mesh_cache_key(mesh), shard_axis,
        )(params, jnp.asarray(known, jnp.float32), mask, key)

    def edit(
        self,
        images: jnp.ndarray,
        strength: float = 0.5,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        mesh=None,
        shard_axis: str = "batch",
    ):
        """SDEdit image-to-image (Meng et al. 2022) — guided editing with any
        trained DDPM-family model, no retraining (beyond the reference's
        sampling surface, like ``inpaint``): noise the input to the
        intermediate step t0 = round(strength·(T−1)) with the closed-form
        ``q_sample``, then run the last t0 ancestral steps of the fused
        reverse scan. Small ``strength`` preserves the input's structure;
        ``strength=1`` is ordinary sampling anchored at the input's coarse
        layout; ``strength=0`` is (up to the √(1−ᾱ₀) forward noise) the
        identity.

        Args:
            images: [B, H, W, C] in [0, 1] display space.
            strength: edit strength in [0, 1] (fraction of the chain re-run).

        Returns [B, H, W, C] in [0, 1]. One fused jit per (shape, strength);
        ``mesh``/``shard_axis`` shard like ``DDPM.sample``.
        """
        from ..modules.gaussian_diffusion import GaussianDiffusion

        if not isinstance(self.sampler, GaussianDiffusion):
            raise ValueError(
                "edit requires a GaussianDiffusion-family sampler (got "
                f"{type(self.sampler).__name__}); SDEdit re-runs the ancestral chain"
            )
        if not 0.0 <= float(strength) <= 1.0:
            raise ValueError(f"strength must be in [0, 1], got {strength}")
        assert images.ndim == 4, f"images is not a batch: {images.shape}"
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = tuple(images.shape)
        t0 = int(round(float(strength) * (self.timesteps - 1)))
        model_fn = self.get_model_fn()
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, images, key):
                k_noise, k_loop = jax.random.split(key)
                x0 = images * 2.0 - 1.0
                t_b = jnp.full((shape[0],), t0, dtype=jnp.int32)
                x_t0 = sampler.q_sample(
                    x0, t_b, jax.random.normal(k_noise, shape, jnp.float32)
                )
                # Unbound base-class call: a DDIM-configured sampler
                # (GeneralizedGaussianDiffusion) overrides p_sample_loop with
                # the strided chain that ignores num_steps — but keeps the
                # ancestral p_mean_variance/constants intact (same reason
                # RePaint works on DDIM archives, modules/repaint.py). SDEdit
                # is defined on the ancestral partial chain, so always run
                # that one.
                return GaussianDiffusion.p_sample_loop(
                    sampler, model_fn, params, shape, k_loop, img=x_t0, num_steps=t0
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, _ = sample_shardings(mesh, shape, shard_axis, frames=True)
            return jax.jit(fn, in_shardings=(rep, out, rep), out_shardings=out)

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "edit", build, shape, t0, mesh_cache_key(mesh), shard_axis
        )(params, jnp.asarray(images, jnp.float32), key)

    def interpolate(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        t: Optional[int] = None,
        lambd: float = 0.5,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        assert x1.ndim == 4, f"x1 is not a batch of tensors ! Given shape {x1.shape}"
        assert x2.ndim == 4, f"x2 is not a batch of tensors ! Given shape {x2.shape}"
        key = key if key is not None else jax.random.PRNGKey(0)
        model_fn = self.get_model_fn()
        sampler = self.sampler

        def build():
            def fn(params, x1, x2, key):
                return sampler.interpolate(model_fn, params, x1, x2, key, t=t, lambd=lambd)

            return jax.jit(fn)

        return self._jitted("interpolate", build, x1.shape, t, lambd)(
            self.params, x1, x2, key
        )
