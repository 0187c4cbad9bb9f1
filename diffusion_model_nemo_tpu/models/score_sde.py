"""Continuous score-SDE model (Song et al. 2021).

Parity with the reference ScoreSDE (diffusion_model_nemo/models/score_sde.py):
SDE selected by ``cfg.sde.sde_type`` among vpsde/subvpsde/vesde sub-configs;
the SDE is wired into sampler, loss, and likelihood estimator; training draws
``t ~ U(0,1)``; ``test_step`` reports ODE bits/dim + NFE.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate, register_target
from ..config.yaml_config import from_dict, to_yaml
from ..data.hf_vision_data import preprocess_batch
from ..modules.sde_lib.likelihood import LikelihoodEstimate
from ..utils import logging
from .abstract_diffusion_model import AbstractDiffusionModel

__all__ = ["ScoreSDE"]


@register_target("diffusion_model_nemo.models.ScoreSDE")
class ScoreSDE(AbstractDiffusionModel):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.continuous = self.cfg.get("continuous", True)
        self.likelihood_weighting = self.cfg.get("likelihood_weighting", False)

        self.diffusion_model = self.build_network()

        sde_type = str(self.cfg.sde.get("sde_type")).lower()
        sde_cfg = self.cfg.sde.get(sde_type)
        self.sde = instantiate(sde_cfg)

        self.sampler = instantiate(self.cfg.sampler)
        self.sampler.update_sde(self.sde)

        self.loss = instantiate(self.cfg.loss)
        self.loss.update_sde(self.sde)

        likelihood_cfg = self.cfg.get("likelihood_estimate")
        self.likelihood_estimator = (
            LikelihoodEstimate() if likelihood_cfg is None else instantiate(likelihood_cfg)
        )
        self.likelihood_estimator.update_sde(self.sde)

    def _example_time(self) -> jnp.ndarray:
        return jnp.full((1,), 0.5, jnp.float32)

    # ---- training -----------------------------------------------------------------
    def training_step(self, params, batch, key, step):
        """t ~ U(0,1), scaled inside the loss (reference score_sde.py:73-102)."""
        k_pre, k_t, k_noise, k_drop = jax.random.split(key, 4)
        proc = preprocess_batch(batch, k_pre, train=True)
        samples = proc["pixel_values"]
        B = samples.shape[0]

        model_fn = self.get_model_fn(proc, training=True, key=k_drop)
        t = jax.random.uniform(k_t, (B,), dtype=jnp.float32)
        noise = jax.random.normal(k_noise, samples.shape, samples.dtype)

        loss = self.loss(model_fn, params, x_start=samples, t=t, noise=noise)
        return loss, {"train_loss": loss}

    # ---- evaluation -----------------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        key = key if key is not None else jax.random.PRNGKey(batch_nb)
        proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
        samples = proc["pixel_values"]
        model_fn = self.get_model_fn(proc)

        def build():
            return jax.jit(
                lambda params, data, key: self.likelihood_estimator.likelihood(
                    model_fn, params, data, key
                )
            )

        bpds, _z, nfe = self._jitted("likelihood", build, samples.shape)(
            self.params, samples, key
        )
        return {
            "bpds": bpds.sum(),
            "nfe": jnp.asarray(nfe, jnp.float32),
            "num_samples": jnp.asarray(samples.shape[0], jnp.int32),
        }

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        result = {
            "test_total_bpd": float(sum(np.asarray(o["bpds"]) for o in outputs)) / total,
            "avg_num_forward_evaluations": float(sum(np.asarray(o["nfe"]) for o in outputs))
            / max(len(outputs), 1),
        }
        logging.info(f"ScoreSDE test: {result}")
        return result

    # ---- inference ---------------------------------------------------------------------
    def sample(
        self,
        batch_size: int,
        image_size: int,
        key=None,
        use_ema: bool = False,
        return_nfe: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        **kwargs,
    ):
        """PC / probability-flow sampling; with ``mesh`` the images are
        sharded over the ``data`` axis (batch rows by default, image rows
        with ``shard_axis="spatial"``) exactly like ``DDPM.sample`` — the
        predictor/corrector (or RK45) scan body is partitioned by XLA."""
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = (batch_size, image_size, image_size, int(self.channels))
        model_fn = self.get_model_fn()
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, key):
                return sampler.sample(model_fn, params, shape, key, return_nfe=return_nfe)

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, _ = sample_shardings(mesh, shape, shard_axis)
            out_shardings = (out, rep) if return_nfe else out
            return jax.jit(fn, in_shardings=(rep, rep), out_shardings=out_shardings)

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "sample_sde",
            build,
            shape,
            return_nfe,
            sampler.version,
            mesh_cache_key(mesh),
            shard_axis,
        )(params, key)

    def interpolate(self, x1, x2, t=None, lambd=0.5, **kwargs):
        raise NotImplementedError()

    def change_sampler(self, sampler_cfg) -> None:
        """Re-instantiate the SDE sampler and re-wire the SDE
        (reference score_sde.py:144-152)."""
        sampler_cfg = from_dict(sampler_cfg)
        self.sampler = instantiate(sampler_cfg)
        self.sampler.update_sde(self.sde)
        self.cfg["sampler"] = sampler_cfg
        self._jit_cache.clear()
        logging.info(f"Sampler config changed to :\n{to_yaml(sampler_cfg)}")
