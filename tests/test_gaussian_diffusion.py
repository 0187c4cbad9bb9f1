"""GaussianDiffusion q/p formulas and the fused scan sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import (
    GaussianDiffusion,
    GeneralizedGaussianDiffusion,
    LearnedGaussianDiffusion,
    WaveGradDiffusion,
)

T = 10
SHAPE = (2, 8, 8, 1)


def zero_model(params, x, t):
    return jnp.zeros_like(x)


@pytest.fixture(scope="module")
def gd():
    return GaussianDiffusion(timesteps=T, schedule_name="linear")


def test_q_sample_closed_form(gd, rng):
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([0, T - 1])
    xt = gd.q_sample(x0, t, noise)
    c = gd.constants
    for i, ti in enumerate([0, T - 1]):
        expected = (
            float(c.sqrt_alphas_cumprod[ti]) * x0[i]
            + float(c.sqrt_one_minus_alphas_cumprod[ti]) * noise[i]
        )
        np.testing.assert_allclose(np.asarray(xt[i]), np.asarray(expected), rtol=1e-5)


def test_predict_start_roundtrip(gd, rng):
    """predict_start_from_noise inverts q_sample exactly."""
    x0 = jax.random.uniform(rng, SHAPE, minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)
    t = jnp.array([3, 7])
    xt = gd.q_sample(x0, t, noise)
    rec = gd.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_at_t0_mean_is_x0(gd, rng):
    """posterior_mean_coef1[0] = 1, coef2[0] = 0 → mean = x_start."""
    x0 = jax.random.normal(rng, SHAPE)
    x = jax.random.normal(jax.random.fold_in(rng, 3), SHAPE)
    mean, _ = gd.q_posterior(x0, x, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)


def test_p_mean_variance_objectives(rng):
    gd_eps = GaussianDiffusion(timesteps=T, schedule_name="linear", objective="pred_noise")
    gd_x0 = GaussianDiffusion(timesteps=T, schedule_name="linear", objective="pred_x0")
    x = jax.random.normal(rng, SHAPE)
    t = jnp.array([4, 4])
    out_eps = gd_eps.p_mean_variance(zero_model, None, x, t)
    # zero predicted noise → x_recon = x / sqrt(acp), then clamped
    expected = jnp.clip(x * gd_eps.constants.sqrt_recip_alphas_cumprod[4], -1, 1)
    np.testing.assert_allclose(np.asarray(out_eps.pred_x_start), np.asarray(expected), rtol=1e-5)
    out_x0 = gd_x0.p_mean_variance(zero_model, None, x, t)
    np.testing.assert_allclose(np.asarray(out_x0.pred_x_start), 0.0, atol=1e-7)


def test_scan_sampler_matches_python_loop(gd, rng):
    """The fused lax.scan reverse loop must equal a step-by-step Python loop
    with the same key schedule."""
    shape = SHAPE

    fused = gd.p_sample_loop(zero_model, None, shape, rng, unnormalize=False)

    # replicate key handling of p_sample_loop
    key, init_key = jax.random.split(rng)
    x = jax.random.normal(init_key, shape, jnp.float32)
    for t in range(T - 1, -1, -1):
        key, sub = jax.random.split(key)
        t_b = jnp.full((shape[0],), t, jnp.int32)
        x = gd.p_sample(zero_model, None, x, t_b, sub)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(x), atol=1e-5)


def test_sample_returns_frames(gd, rng):
    final, frames = gd.p_sample_loop(zero_model, None, SHAPE, rng, return_frames=True)
    assert frames.shape == (T, *SHAPE)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(final), atol=1e-6)


def test_interpolate_shapes(gd, rng):
    x1 = jax.random.uniform(rng, SHAPE, minval=-1, maxval=1)
    x2 = -x1
    out = gd.interpolate(zero_model, None, x1, x2, rng, t=5)
    assert out.shape == SHAPE


def test_ddim_strided_sequences():
    ddim = GeneralizedGaussianDiffusion(
        timesteps=100, schedule_name="linear", eta=0.0, ddim_timesteps=10
    )
    seq, seq_next = ddim._strided_sequences()
    assert list(seq) == list(range(90, -1, -10))
    assert seq_next[-1] == -1
    assert list(seq_next[:-1]) == list(seq[1:])
    assert ddim.alphas_extended_cumprod.shape == (101,)
    assert float(ddim.alphas_extended_cumprod[0]) == 1.0


def test_ddim_deterministic_when_eta0(rng):
    ddim = GeneralizedGaussianDiffusion(
        timesteps=T, schedule_name="linear", eta=0.0, ddim_timesteps=5
    )
    a = ddim.p_sample_loop(zero_model, None, SHAPE, rng)
    b = ddim.p_sample_loop(zero_model, None, SHAPE, rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_learned_variance_interpolation(rng):
    lgd = LearnedGaussianDiffusion(timesteps=T, schedule_name="linear")
    x = jax.random.normal(rng, SHAPE)
    t = jnp.array([2, 5])

    def model2(params, x, t):
        # v = +1 everywhere → log var = log beta_t ; v = -1 → posterior clipped
        return jnp.concatenate([jnp.zeros_like(x), jnp.ones_like(x)], axis=-1)

    out = lgd.p_mean_variance(model2, None, x, t)
    expected = lgd.constants.log_betas[t].reshape(-1, 1, 1, 1) * jnp.ones_like(x)
    np.testing.assert_allclose(np.asarray(out.log_variance), np.asarray(expected), rtol=1e-5)

    def model_neg(params, x, t):
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    out2 = lgd.p_mean_variance(model_neg, None, x, t)
    expected2 = lgd.constants.posterior_log_variance_clipped[t].reshape(-1, 1, 1, 1) * jnp.ones_like(x)
    np.testing.assert_allclose(np.asarray(out2.log_variance), np.asarray(expected2), rtol=1e-5)


def test_wavegrad_continuous_level_and_qsample(rng):
    wg = WaveGradDiffusion(timesteps=T, schedule_name="linear")
    level = wg.sample_continuous_noise_level(4, rng)
    assert level.shape == (4, 1, 1, 1)
    lv = np.asarray(level).ravel()
    lo = float(wg.constants.sqrt_alphas_cumprod_prev[-1])
    assert np.all(lv >= lo - 1e-6) and np.all(lv <= 1.0)
    x0 = jax.random.normal(rng, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8, 8, 1))
    xt = wg.q_sample_continuous(x0, level, noise)
    expected = level * x0 + jnp.sqrt(1 - level**2) * noise
    np.testing.assert_allclose(np.asarray(xt), np.asarray(expected), rtol=1e-5)


def test_wavegrad_schedule_search_restores():
    wg = WaveGradDiffusion(timesteps=50, schedule_name="linear")
    target = float(wg.constants.sqrt_alphas_cumprod_prev[-1])
    wg.search_noise_schedule_coefficients(timesteps=5, iters=50, seed=0, verbose=False)
    wg.change_noise_schedule(verbose=False)
    wg.compute_constants(5)
    short = float(wg.constants.sqrt_alphas_cumprod_prev[-1])
    assert abs(short - target) < 0.2  # random search got close
    wg.change_noise_schedule(reset_cfg=True, verbose=False)
    wg.compute_constants(wg.original_timesteps)
    np.testing.assert_allclose(float(wg.constants.sqrt_alphas_cumprod_prev[-1]), target, rtol=1e-6)
