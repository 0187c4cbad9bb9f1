"""EDM model — Karras et al. 2022 trained natively in the elucidated
parameterization (beyond the reference's model surface; same framework
contract as the DDPM-family models, reference
diffusion_model_nemo/models/ddpm.py for the shape of the surface):
pure-function ``training_step``, cached-jit fused sampling with mesh
sharding, archive save/restore, example CLIs.

The process itself is ``modules/edm_diffusion.py`` — lognormal sigma
sampling, preconditioned denoiser D = c_skip*x + c_out*F(c_in*x, c_noise),
lambda(sigma)-weighted loss, and Algorithm-2 Heun sampling with optional
stochastic churn.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate, register_target
from ..data.hf_vision_data import preprocess_batch
from ..utils import logging
from .abstract_diffusion_model import AbstractDiffusionModel

__all__ = ["EDM"]


@register_target(
    "diffusion_model_nemo.models.EDM",
    "diffusion_model_nemo_tpu.models.EDM",
)
class EDM(AbstractDiffusionModel):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.diffusion_model = self.build_network()
        self.sampler = instantiate(self.cfg.sampler)
        self.loss = instantiate(self.cfg.loss)
        if abs(float(self.loss.sigma_data) - float(self.sampler.sigma_data)) > 1e-9:
            raise ValueError(
                "loss.sigma_data and sampler.sigma_data must match "
                f"(got {self.loss.sigma_data} vs {self.sampler.sigma_data})"
            )
        # Non-leaky augmentation (Karras et al. 2022 §5; data/augment.py):
        # geometric transforms applied with probability `augment_prob`, the
        # network conditioned on the applied-transform descriptor, sampling
        # conditioned on zeros ("nothing applied").
        self.augment_prob = float(self.cfg.get("augment_prob", 0.0) or 0.0)
        self.augment_kwargs = dict(self.cfg.get("augment_kwargs") or {})
        if self.augment_prob > 0.0 and not getattr(self.diffusion_model, "aug_dim", 0):
            raise ValueError(
                "augment_prob > 0 needs a descriptor input on the network: "
                "set model.diffusion_model.aug_dim: 9 (data/augment.AUGMENT_DIM)"
            )

    def _example_time(self) -> jnp.ndarray:
        # representative conditioning magnitude: c_noise at sigma = 1 is 0
        return jnp.zeros((1,), jnp.float32)

    def _bind_classes(self, labels):
        """model_fn bound to per-call labels. Labels are explicit jit
        ARGUMENTS (not closure captures) so `_jitted`-cached graphs stay
        valid across batches; the base family has no class conditioning and
        ignores them (ConditionalEDM overrides)."""
        del labels
        return self.get_model_fn()

    # ---- training ------------------------------------------------------------
    def training_step(self, params, batch, key, step):
        """Pure: (params, raw uint8 batch, key, step) -> (loss, metrics).

        EDM eq. 2/6: sigma ~ LogNormal(P_mean, P_std), x_sigma = x0 + sigma*eps,
        lambda(sigma)-weighted MSE of the preconditioned denoiser vs x0.
        """
        k_pre, k_sig, k_noise, k_drop = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        aug_labels = None
        if self.augment_prob > 0.0:
            # fold_in-tagged key (repo key-stream contract): augment_prob=0
            # keeps the baseline stream bitwise.
            from ..data.augment import augment_pipe

            samples, aug_labels = augment_pipe(
                samples,
                jax.random.fold_in(key, 0x617567),  # "aug"
                self.augment_prob,
                **self.augment_kwargs,
            )

        model_fn = self.get_model_fn(proc, training=True, key=k_drop, aug_cond=aug_labels)

        sigma = self.sampler.sample_sigmas(k_sig, B)
        noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
        x_sigma = self.sampler.q_sample(x_start=samples, sigma=sigma, noise=noise)
        denoised = self.sampler.denoise(model_fn, params, x_sigma, sigma, clip=False)

        loss = self.loss(input=denoised, target=samples, sigma=sigma)
        return loss, {"train_loss": loss}

    # ---- evaluation -----------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        """Held-out EDM denoising loss (the paper's own training/eval metric;
        there is no discrete VLB for the continuous VE path)."""
        key = key if key is not None else jax.random.PRNGKey(batch_nb)
        proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
        samples = proc["pixel_values"]
        labels = proc.get("label")
        labels = labels.astype(jnp.int32) if labels is not None else None

        def build():
            def fn(params, samples, labels, key):
                model_fn = self._bind_classes(labels)
                k_sig, k_noise = jax.random.split(key)
                sigma = self.sampler.sample_sigmas(k_sig, samples.shape[0])
                noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
                x_sigma = self.sampler.q_sample(samples, sigma, noise)
                denoised = self.sampler.denoise(model_fn, params, x_sigma, sigma, clip=False)
                per_sample = self.loss.weight(sigma) * jnp.mean(
                    (denoised - samples) ** 2, axis=(1, 2, 3)
                )
                return jnp.sum(per_sample)

            return jax.jit(fn)

        k_loss, k_nll = jax.random.split(key)
        loss_sum = self._jitted("edm_test", build, samples.shape, labels is not None)(
            self.params, samples, labels, k_loss
        )
        out = {
            "edm_loss_sum": loss_sum,
            "num_samples": jnp.asarray(samples.shape[0], jnp.int32),
        }
        if bool(self.cfg.get("compute_nll", False)):
            bpd, _z, nfe = self.likelihood(samples, key=k_nll, labels=labels)
            out["bpds"] = bpd.sum()
            out["nfe"] = nfe
        return out

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        result = {
            "test_edm_loss": float(sum(np.asarray(o["edm_loss_sum"]) for o in outputs))
            / max(total, 1.0),
        }
        if outputs and "bpds" in outputs[0]:
            result["test_total_bpd"] = (
                float(sum(np.asarray(o["bpds"]) for o in outputs)) / max(total, 1.0)
            )
            result["avg_num_forward_evaluations"] = float(
                sum(np.asarray(o["nfe"]) for o in outputs)
            ) / max(len(outputs), 1)
        logging.info(f"EDM test: {result}")
        return result

    def likelihood(
        self,
        x: jnp.ndarray,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        hutchinson_type: str = "rademacher",
        use_ema: bool = False,
        labels=None,
    ):
        """NLL in bits/dim via the probability-flow ODE (cached jit of
        sampler.likelihood; boundary-truncated at sigma_min like the
        score-SDE estimator's eps cutoff). ``x`` in [-1, 1] data space;
        ``labels`` ([B] int32) conditions class-conditional families (the
        base family ignores them). Returns (bpd [B], latent z, nfe)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        sampler = self.sampler

        def build():
            def fn(params, x, labels, key):
                return sampler.likelihood(
                    self._bind_classes(labels), params, x, key,
                    num_steps=num_steps, hutchinson_type=hutchinson_type,
                )

            return jax.jit(fn)

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "nll_edm", build, x.shape, num_steps, hutchinson_type, use_ema,
            labels is not None,
        )(params, x, labels, key)

    def calculate_bits_per_dimension(
        self, x_start, params=None, key=None, max_batch_size: int = 32, **kwargs
    ):
        """EDM's bits/dim is the probability-flow-ODE NLL (boundary-truncated
        at sigma_min), not the discrete-chain VLB; delegates to
        :meth:`likelihood` with the Trainer-compatible ``total_bpd`` key."""
        if params is not None and params is not self.params:
            raise NotImplementedError(
                "EDM.calculate_bits_per_dimension uses the model's own params; "
                "use likelihood(use_ema=True) for the EMA weights"
            )
        if max_batch_size > 0:
            x_start = x_start[: min(max_batch_size, x_start.shape[0])]
        bpd, _z, nfe = self.likelihood(x_start, key=key)
        return {"total_bpd": bpd, "nfe": nfe}

    # ---- inference services ------------------------------------------------------
    def sample(
        self,
        batch_size: int,
        image_size: int,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        num_steps: Optional[int] = None,
        mesh=None,
        shard_axis: str = "batch",
        model_fn=None,
        cache_tag: tuple = (),
    ):
        """Cached-jit fused Heun/Euler integration; [B, H, W, C] in [0, 1].
        Mesh semantics identical to DDPM.sample (batch or spatial sharding).
        ``model_fn``/``cache_tag`` let conditional subclasses substitute a
        bound denoiser (the tag keys the jit cache for the closure)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        model_fn = model_fn or self.get_model_fn()
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, key):
                return sampler.p_sample_loop(
                    model_fn, params, shape, key,
                    num_steps=num_steps, return_frames=return_frames,
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
            "sample_edm", build, shape, return_frames, num_steps,
            mesh_cache_key(mesh), shard_axis, *cache_tag,
        )(params, key)

    def encode(self, x0: jnp.ndarray, num_steps: Optional[int] = None, use_ema: bool = False):
        """Deterministic data -> latent inversion of the probability-flow ODE
        ([-1, 1] data space; output on the N(0, sigma_max^2) prior scale)."""
        model_fn = self.get_model_fn()
        sampler = self.sampler

        def build():
            return jax.jit(
                lambda params, x0: sampler.encode(model_fn, params, x0, num_steps)
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted("encode_edm", build, x0.shape, num_steps)(params, x0)

    def interpolate(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        t: Optional[int] = None,
        lambd: float = 0.5,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        """Latent-space interpolation via exact ODE inversion (encode ->
        slerp -> decode); deterministic, unlike the DDPM-family's noised mix."""
        assert x1.ndim == 4, f"x1 is not a batch of tensors ! Given shape {x1.shape}"
        assert x2.ndim == 4, f"x2 is not a batch of tensors ! Given shape {x2.shape}"
        key = key if key is not None else jax.random.PRNGKey(0)
        model_fn = self.get_model_fn()
        sampler = self.sampler

        def build():
            return jax.jit(
                lambda params, x1, x2, key: sampler.interpolate(
                    model_fn, params, x1, x2, key, t=t, lambd=lambd
                )
            )

        return self._jitted("interpolate_edm", build, x1.shape, t, lambd)(
            self.params, x1, x2, key
        )
