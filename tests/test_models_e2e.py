"""End-to-end training/sampling for every model family (tiny shapes, CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import (
    ConditionalDDPM,
    ImprovedDDPM,
    ScoreSDE,
    WavegradDDPM,
)
from diffusion_model_nemo_tpu.training import Trainer

pytestmark = pytest.mark.slow  # full train->sample->test drives per family

IMG = 8
T = 5


def base_cfg(tmp_path, **extra):
    cfg = {
        "image_size": IMG,
        "timesteps": T,
        "channels": 1,
        "save_every": 0,
        "results_dir": str(tmp_path / "results"),
        "train_ds": {
            "name": "synthetic",
            "image_size": IMG,
            "channels": 1,
            "length": 32,
            "batch_size": 8,
            "shuffle": True,
            "num_classes": 4,
        },
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "input_dim": IMG,
            "dim": 8,
            "channels": 1,
            "dim_mults": [1, 2],
            "use_convnext": False,
            "resnet_block_groups": 4,
        },
        "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
        "optim": {"name": "adamw", "lr": 1e-3},
    }
    cfg.update(extra)
    return from_dict(cfg)


def run_steps(model, steps=2):
    trainer = Trainer(devices=-1, max_steps=steps, log_every_n_steps=1)
    trainer.fit(model)
    for leaf in jax.tree.leaves(model.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    return model


def test_improved_ddpm_e2e(tmp_path):
    cfg = base_cfg(
        tmp_path,
        sampler={
            "_target_": "diffusion_model_nemo.modules.LearnedGaussianDiffusion",
            "timesteps": T,
            "schedule_name": "cosine",
        },
        vb_loss={
            "_target_": "diffusion_model_nemo.loss.VariationalBoundLoss",
            "weight": 0.001,
        },
    )
    cfg.diffusion_model["learned_variance"] = True
    model = ImprovedDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    # metrics include the hybrid pieces
    batch = {"image": jnp.zeros((4, IMG, IMG, 1), jnp.uint8)}
    loss, metrics = jax.jit(model.training_step)(
        model.params, batch, jax.random.PRNGKey(0), jnp.asarray(0)
    )
    assert {"train_loss", "simple_loss", "vb_losses"} <= set(metrics)
    run_steps(model)
    imgs = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1))
    assert imgs.shape == (2, IMG, IMG, 1)
    # bits/dim with learned variance
    bpd = model.calculate_bits_per_dimension(jnp.zeros((2, IMG, IMG, 1)))
    assert bpd["total_bpd"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(bpd["total_bpd"])))


def test_conditional_ddpm_e2e(tmp_path):
    cfg = base_cfg(
        tmp_path,
        num_classes=4,
        sampler={
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": T,
            "schedule_name": "linear",
            "class_conditional": True,
        },
    )
    cfg.diffusion_model["num_classes"] = 4
    model = ConditionalDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    run_steps(model)
    uncond = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1))
    cond = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1), label=2)
    assert uncond.shape == cond.shape == (2, IMG, IMG, 1)
    # class conditioning must change the samples (same key, different label)
    assert np.abs(np.asarray(uncond) - np.asarray(cond)).max() > 1e-6
    interp = model.interpolate(
        jnp.zeros((2, IMG, IMG, 1)), jnp.ones((2, IMG, IMG, 1)), t=3, label=1
    )
    assert interp.shape == (2, IMG, IMG, 1)


def test_score_sde_e2e(tmp_path):
    cfg = base_cfg(
        tmp_path,
        continuous=True,
        likelihood_weighting=False,
        sde={
            "sde_type": "vpsde",
            "vpsde": {
                "_target_": "diffusion_model_nemo.modules.VPSDE",
                "beta_min": 0.1,
                "beta_max": 20.0,
                "N": 20,
            },
        },
        sampler={
            "_target_": "diffusion_model_nemo.modules.PredictorCorrectorSampler",
            "predictor": "euler_maruyama",
            "corrector": None,
            "snr": 0.16,
        },
        loss={
            "_target_": "diffusion_model_nemo.loss.SDEScoreFunctionLoss",
            "continuous": True,
            "likelihood_weighting": False,
        },
        likelihood_estimate={
            "_target_": "diffusion_model_nemo.modules.LikelihoodEstimate",
            "max_steps": 500,
        },
    )
    model = ScoreSDE(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    run_steps(model)
    imgs = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1))
    assert imgs.shape == (2, IMG, IMG, 1)
    # test_step computes ODE bits/dim + NFE
    out = model.test_step({"image": np.zeros((2, IMG, IMG, 1), np.uint8)}, 0)
    assert np.isfinite(float(out["bpds"]))
    assert float(out["nfe"]) > 0
    # swap to probability-flow sampler
    model.change_sampler(
        {"_target_": "diffusion_model_nemo.modules.ProbabilityFlowSampler", "max_steps": 500}
    )
    imgs2 = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert imgs2.shape == (2, IMG, IMG, 1)


def test_wavegrad_e2e(tmp_path):
    cfg = base_cfg(
        tmp_path,
        sampler={
            "_target_": "diffusion_model_nemo.modules.WaveGradDiffusion",
            "timesteps": 20,
            "schedule_name": "linear",
            "schedule_cfg": {"linear": {"beta_start": 1e-6, "beta_end": 0.01}},
        },
        timesteps=20,
    )
    cfg.diffusion_model["_target_"] = "diffusion_model_nemo.modules.WaveGradUNet"
    cfg.diffusion_model["with_time_emb"] = False
    model = WavegradDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    run_steps(model)
    imgs = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1))
    assert imgs.shape == (2, IMG, IMG, 1)
    # schedule hot-swap: short schedule sampling then restore
    model.sampler.search_noise_schedule_coefficients(timesteps=5, iters=20, seed=0, verbose=False)
    model.sampler.change_noise_schedule(verbose=False)
    model.sampler.compute_constants(5)
    model._jit_cache.clear()
    fast = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert fast.shape == (2, IMG, IMG, 1)
    model.sampler.change_noise_schedule(reset_cfg=True, verbose=False)
    model.sampler.compute_constants(model.sampler.original_timesteps)
    assert model.sampler.timesteps == 20
