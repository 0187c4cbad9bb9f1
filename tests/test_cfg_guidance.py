"""Classifier-free guidance sampling (ConditionalDDPM.sample(guidance_scale=w)).

The reference trains jointly conditional/unconditional via 50% label masking
(reference conditional_ddpm.py:57-67) — exactly the CFG recipe — but never
exploits it at sampling. This path does: one 2B-batched network call per
step, eps = eps_uncond + w * (eps_cond - eps_uncond).
"""

import numpy as np
import jax
import pytest

from diffusion_model_nemo_tpu.models import ConditionalDDPM
from diffusion_model_nemo_tpu.parallel import make_mesh
from tests.test_models_e2e import IMG, base_cfg


def make_model(tmp_path):
    cfg = base_cfg(
        tmp_path,
        num_classes=4,
        sampler={
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 5,
            "schedule_name": "linear",
            "class_conditional": True,
        },
    )
    cfg.diffusion_model["num_classes"] = 4
    model = ConditionalDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_guidance_one_matches_conditional(tmp_path):
    """w=1 collapses to eps_cond: identical to plain conditional sampling up
    to fp rounding (the CFG path still computes the unconditional branch)."""
    model = make_model(tmp_path)
    key = jax.random.PRNGKey(3)
    plain = model.sample(batch_size=4, image_size=IMG, key=key, label=2)
    guided = model.sample(
        batch_size=4, image_size=IMG, key=key, label=2, guidance_scale=1.0
    )
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(guided), rtol=0, atol=1e-4
    )


def test_guidance_scale_changes_samples(tmp_path):
    model = make_model(tmp_path)
    key = jax.random.PRNGKey(3)
    w1 = model.sample(batch_size=4, image_size=IMG, key=key, label=2, guidance_scale=1.0)
    w3 = model.sample(batch_size=4, image_size=IMG, key=key, label=2, guidance_scale=3.0)
    assert np.abs(np.asarray(w1) - np.asarray(w3)).max() > 1e-6


def test_guidance_requires_label(tmp_path):
    model = make_model(tmp_path)
    with pytest.raises(ValueError, match="label"):
        model.sample(batch_size=2, image_size=IMG, guidance_scale=2.0)


def test_guidance_composes_with_mesh(tmp_path):
    """Guided sampling under batch sharding must equal the unsharded result
    (same keys/params; XLA SPMD handles the in-scan 2B concat)."""
    model = make_model(tmp_path)
    key = jax.random.PRNGKey(5)
    ref = model.sample(batch_size=8, image_size=IMG, key=key, label=1, guidance_scale=2.5)
    mesh = make_mesh()
    sharded = model.sample(
        batch_size=8, image_size=IMG, key=key, label=1, guidance_scale=2.5, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(sharded), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize(
    "sampler_target,extra",
    [
        (
            "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
            {"ddim_timesteps": 3, "eta": 0.0},
        ),
        (
            "diffusion_model_nemo.modules.DPMSolverDiffusion",
            {"solver_steps": 3, "solver_order": 2},
        ),
    ],
)
def test_guidance_composes_with_fast_samplers(tmp_path, sampler_target, extra):
    """CFG is a model_fn wrapper, so it must compose with every sampler that
    honors the p_sample_loop contract — DDIM and DPM-Solver++(2M) are the
    production fast-sampling configurations (guided few-step sampling is the
    standard serving recipe). w=1 collapses to plain conditional under the
    SAME fast sampler; w=3 moves the samples."""
    model = make_model(tmp_path)
    model.change_sampler(
        {
            "_target_": sampler_target,
            "timesteps": 5,
            "schedule_name": "linear",
            "class_conditional": True,
            **extra,
        }
    )
    key = jax.random.PRNGKey(7)
    plain = model.sample(batch_size=4, image_size=IMG, key=key, label=1)
    w1 = model.sample(batch_size=4, image_size=IMG, key=key, label=1, guidance_scale=1.0)
    w3 = model.sample(batch_size=4, image_size=IMG, key=key, label=1, guidance_scale=3.0)
    assert w1.shape == (4, IMG, IMG, 1)
    assert np.isfinite(np.asarray(w3)).all()
    np.testing.assert_allclose(np.asarray(plain), np.asarray(w1), rtol=0, atol=1e-4)
    assert np.abs(np.asarray(w1) - np.asarray(w3)).max() > 1e-6
