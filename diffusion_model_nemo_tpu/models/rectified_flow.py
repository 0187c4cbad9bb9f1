"""Rectified-flow / flow-matching model (beyond the reference's surface).

Same framework contract as the DDPM-family models
(reference diffusion_model_nemo/models/ddpm.py for the shape of the
surface): pure-function ``training_step``, cached-jit fused sampling with
mesh sharding, archive save/restore, example CLIs. The process itself is
``modules/rectified_flow.py`` — linear-interpolation path, velocity
regression, deterministic ODE sampling with exact inversion.
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

__all__ = ["RectifiedFlow"]


@register_target(
    "diffusion_model_nemo.models.RectifiedFlow",
    "diffusion_model_nemo_tpu.models.RectifiedFlow",
)
class RectifiedFlow(AbstractDiffusionModel):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.diffusion_model = self.build_network()
        self.sampler = instantiate(self.cfg.sampler)
        self.loss = instantiate(self.cfg.loss)

    def _example_time(self) -> jnp.ndarray:
        # representative conditioning magnitude (mid-path, scaled)
        return jnp.full((1,), 0.5 * float(self.sampler.time_scale), jnp.float32)

    # ---- training ------------------------------------------------------------
    def training_step(self, params, batch, key, step):
        """Pure: (params, raw uint8 batch, key, step) -> (loss, metrics).

        Conditional flow matching: t ~ sampler.time_sampling, x_t on the
        linear path, regress the constant path velocity eps - x0.
        """
        k_pre, k_t, k_noise, k_drop = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        model_fn = self.get_model_fn(proc, training=True, key=k_drop)

        t = self.sampler.sample_times(k_t, B)
        noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
        x_t = self.sampler.q_sample(x_start=samples, t=t, noise=noise)
        model_output = model_fn(params, x_t, self.sampler.model_time(t))

        loss = self.loss(input=model_output, target=self.sampler.v_target(samples, noise))
        return loss, {"train_loss": loss}

    # ---- evaluation -----------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        """Held-out flow-matching loss + (unless ``model.compute_nll: false``)
        the EXACT NLL in bits/dim via the change-of-variables ODE
        (sampler.likelihood — the flow analogue of ScoreSDE's test_step)."""
        key = key if key is not None else jax.random.PRNGKey(batch_nb)
        k_loss, k_nll = jax.random.split(key)
        proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
        samples = proc["pixel_values"]
        model_fn = self.get_model_fn(proc)

        def build():
            def fn(params, samples, key):
                k_t, k_noise = jax.random.split(key)
                t = self.sampler.sample_times(k_t, samples.shape[0])
                noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
                x_t = self.sampler.q_sample(samples, t, noise)
                out = model_fn(params, x_t, self.sampler.model_time(t))
                target = self.sampler.v_target(samples, noise)
                return jnp.sum(jnp.mean((out - target) ** 2, axis=(1, 2, 3)))

            return jax.jit(fn)

        loss_sum = self._jitted("fm_test", build, samples.shape)(self.params, samples, k_loss)
        out = {
            "fm_loss_sum": loss_sum,
            "num_samples": jnp.asarray(samples.shape[0], jnp.int32),
        }
        if bool(self.cfg.get("compute_nll", True)):
            bpd, _z, nfe = self.likelihood(samples, key=k_nll, model_fn=model_fn)
            out["bpds"] = bpd.sum()
            out["nfe"] = nfe
        return out

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        result = {
            "test_fm_loss": float(sum(np.asarray(o["fm_loss_sum"]) for o in outputs))
            / max(total, 1.0),
        }
        if outputs and "bpds" in outputs[0]:
            result["test_total_bpd"] = (
                float(sum(np.asarray(o["bpds"]) for o in outputs)) / max(total, 1.0)
            )
            result["avg_num_forward_evaluations"] = float(
                sum(np.asarray(o["nfe"]) for o in outputs)
            ) / max(len(outputs), 1)
        logging.info(f"RectifiedFlow test: {result}")
        return result

    def likelihood(
        self,
        x: jnp.ndarray,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        hutchinson_type: str = "rademacher",
        use_ema: bool = False,
        model_fn=None,
    ):
        """Exact NLL in bits/dim (cached jit of sampler.likelihood). ``x`` in
        [-1, 1] data space. Returns (bpd [B], latent z, nfe)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        model_fn = model_fn or self.get_model_fn()
        sampler = self.sampler

        def build():
            return jax.jit(
                lambda params, x, key: sampler.likelihood(
                    model_fn, params, x, key,
                    num_steps=num_steps, hutchinson_type=hutchinson_type,
                )
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "nll_rf", build, x.shape, num_steps, hutchinson_type, use_ema
        )(params, x, key)

    def calculate_bits_per_dimension(
        self, x_start, params=None, key=None, max_batch_size: int = 32, **kwargs
    ):
        """The flow's bits/dim is the EXACT change-of-variables NLL, not the
        discrete-chain VLB the DDPM-family method computes; delegates to
        :meth:`likelihood` and returns the ``total_bpd`` key the Trainer's
        periodic bpd logging expects."""
        if params is not None and params is not self.params:
            raise NotImplementedError(
                "RectifiedFlow.calculate_bits_per_dimension uses the model's "
                "own params; use likelihood(use_ema=True) for the EMA weights"
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
        **kwargs,
    ):
        """Cached-jit fused ODE integration; [B, H, W, C] in [0, 1]. Mesh
        semantics identical to DDPM.sample (batch or spatial sharding)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        model_fn = self.get_model_fn()
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
            "sample_rf", build, shape, return_frames, num_steps,
            mesh_cache_key(mesh), shard_axis,
        )(params, key)

    def encode(self, x0: jnp.ndarray, num_steps: Optional[int] = None, use_ema: bool = False):
        """Deterministic data -> latent inversion ([-1, 1] data space)."""
        model_fn = self.get_model_fn()
        sampler = self.sampler

        def build():
            return jax.jit(
                lambda params, x0: sampler.encode(model_fn, params, x0, num_steps)
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted("encode_rf", build, x0.shape, num_steps)(params, x0)

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

        return self._jitted("interpolate_rf", build, x1.shape, t, lambd)(
            self.params, x1, x2, key
        )
