"""End-to-end: DDPM on synthetic data through the Trainer + archive round-trip.

This is the framework's minimum end-to-end slice (SURVEY §7 build order #4):
jitted train step, EMA, fused scan sampler, checkpoint archive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.training import Trainer


def tiny_ddpm_cfg(tmp_path, timesteps=5, image_size=8):
    return from_dict(
        {
            "image_size": image_size,
            "timesteps": timesteps,
            "channels": 1,
            "save_every": 0,  # disable image dumps in tests
            "results_dir": str(tmp_path / "results"),
            "train_ds": {
                "name": "synthetic",
                "image_size": image_size,
                "channels": 1,
                "length": 64,
                "batch_size": 16,
                "shuffle": True,
            },
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.Unet",
                "input_dim": image_size,
                "dim": 8,
                "channels": 1,
                "dim_mults": [1, 2],
                "use_convnext": False,
                "resnet_block_groups": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": timesteps,
                "schedule_name": "linear",
            },
            "loss": {
                "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
                "loss_type": "l2",
            },
            "optim": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.98], "weight_decay": 0.0},
        }
    )


def test_ddpm_trains_and_loss_decreases(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(model.params)[0].copy()

    trainer = Trainer(devices=-1, max_steps=6, log_every_n_steps=2)
    trainer.fit(model)

    # params actually moved
    p1 = jax.tree.leaves(model.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # EMA differs from raw params but is finite
    e1 = jax.tree.leaves(model.ema_params)[0]
    assert np.all(np.isfinite(np.asarray(e1)))

    # sampling works post-training
    imgs = model.sample(batch_size=2, image_size=8, key=jax.random.PRNGKey(1))
    assert imgs.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(imgs)))


def test_archive_roundtrip(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "model.dmn")
    model.save_to(path)

    restored = DDPM.restore_from(path)
    assert restored.timesteps == model.timesteps
    a = jax.tree.leaves(model.params)
    b = jax.tree.leaves(restored.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_training_step_is_pure_and_jittable(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.zeros((4, 8, 8, 1), jnp.uint8),
        "label": jnp.zeros((4,), jnp.int32),
    }
    step_fn = jax.jit(model.training_step)
    loss, metrics = step_fn(model.params, batch, jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(loss))
    loss2, _ = step_fn(model.params, batch, jax.random.PRNGKey(0), jnp.asarray(0))
    np.testing.assert_allclose(float(loss), float(loss2))


def test_change_sampler_to_ddim(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
    sampler_cfg["eta"] = 0.0
    sampler_cfg["ddim_timesteps"] = 2
    model.change_sampler(sampler_cfg)
    assert model.cfg.sampler["ddim_timesteps"] == 2
    imgs = model.sample(batch_size=2, image_size=8, key=jax.random.PRNGKey(0))
    assert imgs.shape == (2, 8, 8, 1)
