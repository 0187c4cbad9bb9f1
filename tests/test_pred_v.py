"""v-prediction objective (beyond-reference; Salimans & Ho 2022).

Correctness anchors:
  1. The (x0, eps) <-> v linear maps are exact inverses through q_sample.
  2. A pred_v sampler fed the exact v conversion of an epsilon-field is
     indistinguishable from the pred_noise sampler fed the epsilon-field —
     across ancestral DDPM, DDIM (incl. the extended-alpha grid), and
     DPM-Solver++ paths, with identical key streams.
  3. Training targets: DDPM/ImprovedDDPM compute the exact v for the drawn
     (x0, t, eps) triple when the sampler objective is pred_v.
  4. WaveGrad (continuous noise level) rejects pred_v loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import (
    DPMSolverDiffusion,
    GaussianDiffusion,
    GeneralizedGaussianDiffusion,
    WaveGradDiffusion,
)

T = 50
IMG = 8


def _eps_field(acp):
    """Deterministic epsilon-field: a fixed smooth function of (x, t) whose
    implied x0 stays inside the clip range on most of the chain."""
    x0_star = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (1, IMG, IMG, 1)), jnp.float32
    )

    def eps_fn(params, x, t):
        a = jnp.take(acp, t.astype(jnp.int32))[:, None, None, None]
        return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1.0 - a)

    return eps_fn


def _v_field_from_eps(eps_fn, acp_ext, t_offset=1):
    """Exact v conversion of an epsilon-field on the extended-alpha grid:
    v = sqrt(a)*eps - sqrt(1-a)*x0,  x0 = (x - sqrt(1-a)*eps)/sqrt(a)."""

    def v_fn(params, x, t):
        a = jnp.take(acp_ext, t.astype(jnp.int32) + t_offset)[:, None, None, None]
        eps = eps_fn(params, x, t)
        x0 = (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        return jnp.sqrt(a) * eps - jnp.sqrt(1.0 - a) * x0

    return v_fn


def test_v_identities_roundtrip(rng):
    gd = GaussianDiffusion(timesteps=T, schedule_name="cosine")
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.uniform(k1, (4, IMG, IMG, 3), minval=-1.0, maxval=1.0)
    eps = jax.random.normal(k2, x0.shape)
    t = jax.random.randint(k3, (4,), 0, T)

    v = gd.v_target(x0, t, eps)
    x_t = gd.q_sample(x0, t, eps)
    np.testing.assert_allclose(
        np.asarray(gd.predict_start_from_v(x_t, t, v)), np.asarray(x0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gd.predict_noise_from_v(x_t, t, v)), np.asarray(eps), atol=1e-5
    )

    # v_target matches the hand formula
    c = np.asarray(gd.constants.alphas_cumprod)[np.asarray(t)][:, None, None, None]
    v_np = np.sqrt(c) * np.asarray(eps) - np.sqrt(1.0 - c) * np.asarray(x0)
    np.testing.assert_allclose(np.asarray(v), v_np, atol=1e-6)


def test_p_mean_variance_matches_pred_noise(rng):
    gd_eps = GaussianDiffusion(timesteps=T, schedule_name="linear")
    gd_v = GaussianDiffusion(timesteps=T, schedule_name="linear", objective="pred_v")
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (4, IMG * IMG * 1))
    eps = jax.random.normal(k2, x.shape)
    t = jax.random.randint(k3, (4,), 0, T)

    x0 = gd_eps.predict_start_from_noise(x, t, eps)
    v = gd_eps.constants.sqrt_alphas_cumprod[t][:, None] * eps - (
        gd_eps.constants.sqrt_one_minus_alphas_cumprod[t][:, None] * x0
    )

    a = gd_eps.p_mean_variance(None, None, x, t, model_output=eps)
    b = gd_v.p_mean_variance(None, None, x, t, model_output=v)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a.pred_x_start), np.asarray(b.pred_x_start), atol=1e-5
    )


def test_ancestral_sampling_matches_pred_noise():
    gd_eps = GaussianDiffusion(timesteps=T, schedule_name="cosine")
    gd_v = GaussianDiffusion(timesteps=T, schedule_name="cosine", objective="pred_v")
    eps_fn = _eps_field(gd_eps.constants.alphas_cumprod)
    # plain (non-extended) grid: index with t directly
    v_fn = _v_field_from_eps(
        eps_fn, gd_eps.constants.alphas_cumprod, t_offset=0
    )

    shape = (2, IMG, IMG, 1)
    key = jax.random.PRNGKey(7)
    a = gd_eps.p_sample_loop(eps_fn, None, shape, key)
    b = gd_v.p_sample_loop(v_fn, None, shape, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_ddim_sampling_matches_pred_noise(eta):
    dd_eps = GeneralizedGaussianDiffusion(
        timesteps=T, schedule_name="cosine", eta=eta, ddim_timesteps=10
    )
    dd_v = GeneralizedGaussianDiffusion(
        timesteps=T,
        schedule_name="cosine",
        eta=eta,
        ddim_timesteps=10,
        objective="pred_v",
    )
    eps_fn = _eps_field(dd_eps.constants.alphas_cumprod)
    v_fn = _v_field_from_eps(eps_fn, dd_eps.alphas_extended_cumprod, t_offset=1)

    shape = (2, IMG, IMG, 1)
    key = jax.random.PRNGKey(11)
    a = dd_eps.p_sample_loop(eps_fn, None, shape, key)
    b = dd_v.p_sample_loop(v_fn, None, shape, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dpm_solver_matches_pred_noise():
    dpm_eps = DPMSolverDiffusion(
        timesteps=T, schedule_name="cosine", solver_steps=8, solver_order=2
    )
    dpm_v = DPMSolverDiffusion(
        timesteps=T,
        schedule_name="cosine",
        solver_steps=8,
        solver_order=2,
        objective="pred_v",
    )
    eps_fn = _eps_field(dpm_eps.constants.alphas_cumprod)
    v_fn = _v_field_from_eps(eps_fn, dpm_eps.alphas_extended_cumprod, t_offset=1)

    shape = (2, IMG, IMG, 1)
    key = jax.random.PRNGKey(13)
    a = dpm_eps.p_sample_loop(eps_fn, None, shape, key)
    b = dpm_v.p_sample_loop(v_fn, None, shape, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_wavegrad_rejects_pred_v():
    with pytest.raises(ValueError, match="pred_noise|pred_x0"):
        WaveGradDiffusion(timesteps=T, schedule_name="linear", objective="pred_v")


def _tiny_model_cfg(objective):
    return {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 10,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
            "objective": objective,
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


def test_ddpm_training_targets_exact_v():
    """The pred_v training step's loss equals the hand-computed
    ||model_output - v_target||^2 under the same key stream."""
    from diffusion_model_nemo_tpu.data.hf_vision_data import preprocess_batch
    from diffusion_model_nemo_tpu.models import DDPM

    model = DDPM(cfg=_tiny_model_cfg("pred_v"))
    key = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(1).integers(
                0, 255, (4, IMG, IMG, 1), dtype=np.uint8
            )
        )
    }
    params = model.init_params(jax.random.PRNGKey(2))
    loss, metrics = model.training_step(params, batch, key, step=0)
    assert np.isfinite(float(loss))

    # replay the step's internal randomness (same split order as training_step)
    k_pre, k_t, k_noise, k_drop = jax.random.split(key, 4)
    proc = preprocess_batch(batch, k_pre, train=True)
    samples = proc["pixel_values"]
    t = jax.random.randint(k_t, (4,), 0, model.timesteps, dtype=jnp.int32)
    noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
    x_t = model.sampler.q_sample(samples, t, noise)
    model_fn = model.get_model_fn(proc, training=True, key=k_drop)
    out = model_fn(params, x_t, t)
    v = model.sampler.v_target(samples, t, noise)
    manual = jnp.mean((out - v) ** 2)
    np.testing.assert_allclose(float(loss), float(manual), rtol=1e-5)


def test_pred_v_sampling_e2e_shapes():
    from diffusion_model_nemo_tpu.models import DDPM

    model = DDPM(cfg=_tiny_model_cfg("pred_v"))
    model.init_params(jax.random.PRNGKey(0))
    out = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1))
    assert out.shape == (2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))
