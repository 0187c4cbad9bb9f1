"""Lockstep golden for discrete VLB bits/dim (VERDICT r2 item 3).

An independent numpy implementation of the reference's bits/dim loop
(reference abstract_diffusion_model.py:137-197: per-t q_sample → q_posterior
→ p_mean_variance → VLB term, prior KL at the end) is run with IDENTICAL
per-t noise against ``AbstractDiffusionModel.calculate_bits_per_dimension``'s
fused scan, for both the fixed-variance (DDPM/GaussianDiffusion) and
learned-variance (ImprovedDDPM/LearnedGaussianDiffusion) processes.

The numpy golden re-derives every formula from the published math (Ho et al.
2020 eq. 4/6/7; Nichol & Dhariwal 2021 eq. 15; Salimans PixelCNN++
discretized NLL) — it shares no code with the scan under test. A final canary
asserts a *wrong* t=0 boundary (KL instead of the discretized decoder NLL —
exactly the switch SURVEY.md flags as easy to get subtly wrong) is caught.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM, ImprovedDDPM

T = 20
IMG = 8
B = 4
LOG2 = math.log(2.0)


# --------------------------------------------------------------- numpy golden
def np_tables(betas_f32):
    """Constant tables from betas — float64 derivation, float32 storage
    (the same precision contract as ops/schedules.compute_schedule_constants,
    re-derived here from the Ho et al. closed forms)."""
    b = betas_f32.astype(np.float64)
    alphas = 1.0 - b
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    post_var = b * (1.0 - acp_prev) / (1.0 - acp)
    t32 = lambda x: np.asarray(x, dtype=np.float32)
    return {
        "betas": t32(b),
        "log_betas": t32(np.log(b)),
        "sqrt_acp": t32(np.sqrt(acp)),
        "sqrt_1macp": t32(np.sqrt(1.0 - acp)),
        "log_1macp": t32(np.log(1.0 - acp)),
        "sqrt_recip_acp": t32(np.sqrt(1.0 / acp)),
        "sqrt_recipm1_acp": t32(np.sqrt(1.0 / acp - 1.0)),
        "post_log_var_clipped": t32(np.log(np.concatenate([[post_var[1]], post_var[1:]]))),
        "post_coef1": t32(b * np.sqrt(acp_prev) / (1.0 - acp)),
        "post_coef2": t32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
    }


def np_normal_kl(m1, lv1, m2, lv2):
    return 0.5 * (-1.0 + lv2 - lv1 + np.exp(lv1 - lv2) + (m1 - m2) ** 2 * np.exp(-lv2))


def np_discretized_gaussian_ll(x, means, log_scales, thres=0.999):
    cdf = lambda v: 0.5 * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (v + 0.044715 * v**3)))
    safelog = lambda v: np.log(np.clip(v, 1e-12, None))
    inv_stdv = np.exp(-log_scales)
    centered = x - means
    cdf_plus = cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = cdf(inv_stdv * (centered - 1.0 / 255.0))
    return np.where(
        x < -thres,
        safelog(cdf_plus),
        np.where(x > thres, safelog(1.0 - cdf_min), safelog(cdf_plus - cdf_min)),
    )


def np_mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def np_bpd_golden(tab, x_start, noises, eps_fn, logvar_fn=None, wrong_t0=False):
    """The reference loop (abstract_diffusion_model.py:156-197) in numpy.

    ``noises[t]`` is the q_sample noise used at timestep t; ``eps_fn(x_t, t)``
    the network's noise prediction; ``logvar_fn(x_t, t)`` the learned
    v-interp fraction in [-1, 1] (None → fixed posterior variance).
    ``wrong_t0=True`` drops the t=0 decoder-NLL switch (canary).
    """
    Bn = x_start.shape[0]
    terms = np.zeros((Bn, T), dtype=np.float64)
    for t in range(T - 1, -1, -1):
        x_t = tab["sqrt_acp"][t] * x_start + tab["sqrt_1macp"][t] * noises[t]
        true_mean = tab["post_coef1"][t] * x_start + tab["post_coef2"][t] * x_t
        true_log_var = tab["post_log_var_clipped"][t]

        eps_hat = eps_fn(x_t, t)
        x0_pred = np.clip(
            tab["sqrt_recip_acp"][t] * x_t - tab["sqrt_recipm1_acp"][t] * eps_hat,
            -1.0,
            1.0,
        )
        model_mean = tab["post_coef1"][t] * x0_pred + tab["post_coef2"][t] * x_t
        if logvar_fn is None:
            model_log_var = np.full_like(model_mean, tab["post_log_var_clipped"][t])
        else:
            frac = (logvar_fn(x_t, t) + 1.0) * 0.5
            model_log_var = frac * tab["log_betas"][t] + (1.0 - frac) * true_log_var

        kl = np_mean_flat(
            np_normal_kl(true_mean, true_log_var, model_mean, model_log_var)
        ) / LOG2
        nll = -np_mean_flat(
            np_discretized_gaussian_ll(x_start, model_mean, 0.5 * model_log_var)
        ) / LOG2
        terms[:, t] = kl if (t > 0 or wrong_t0) else nll

    qt_mean = tab["sqrt_acp"][T - 1] * x_start
    qt_log_var = tab["log_1macp"][T - 1]
    prior = np_mean_flat(np_normal_kl(qt_mean, qt_log_var, 0.0, 0.0)) / LOG2
    return {"total_bpd": terms.sum(axis=1) + prior, "terms_bpd": terms, "prior_bpd": prior}


# ----------------------------------------------------------------- shared setup
def replayed_noises(key, shape):
    """Replicate the scan's carry-chain key splits (k, sub = split(k) per t,
    t descending) so golden and scan see identical q_sample noise."""
    noises = {}
    k = key
    for t in range(T - 1, -1, -1):
        k, sub = jax.random.split(k)
        noises[t] = np.asarray(jax.random.normal(sub, shape, jnp.float32))
    return noises


def quantized_x_start(seed):
    """8-bit-grid data in [-1, 1] with forced ±1 pixels so the decoder NLL's
    tail-bin branches (|x| > 0.999) execute."""
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, size=(B, IMG, IMG, 1)).astype(np.float32)
    x = x / 127.5 - 1.0
    x[:, 0, 0, 0] = 1.0
    x[:, 0, 1, 0] = -1.0
    return x


def model_cfg(sampler_target):
    return from_dict(
        {
            "image_size": IMG,
            "timesteps": T,
            "channels": 1,
            "save_every": 0,
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.Unet",
                "input_dim": IMG,
                "dim": 8,
                "channels": 1,
                "dim_mults": [1, 2],
                "resnet_block_groups": 4,
                "learned_variance": sampler_target.endswith("LearnedGaussianDiffusion"),
            },
            "sampler": {
                "_target_": sampler_target,
                "timesteps": T,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
            "vb_loss": {"_target_": "diffusion_model_nemo.loss.VariationalBoundLoss"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )


def np_eps(x_t, t):
    return np.tanh(0.7 * x_t) * (0.8 + 0.2 * np.cos(0.3 * t))


def np_vfrac(x_t, t):
    return np.sin(0.5 * x_t + 0.1 * t)


def test_bpd_matches_numpy_golden_fixed_variance():
    model = DDPM(cfg=model_cfg("diffusion_model_nemo.modules.GaussianDiffusion"))
    x = quantized_x_start(0)
    key = jax.random.PRNGKey(3)

    def model_fn(params, xb, tb):
        tf = tb.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return jnp.tanh(0.7 * xb) * (0.8 + 0.2 * jnp.cos(0.3 * tf))

    got = model.calculate_bits_per_dimension(
        jnp.asarray(x), params={}, key=key, model_fn=model_fn
    )
    golden = np_bpd_golden(
        np_tables(np.asarray(model.sampler.constants.betas)),
        x,
        replayed_noises(key, x.shape),
        np_eps,
    )
    np.testing.assert_allclose(
        np.asarray(got["prior_bpd"]), golden["prior_bpd"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["terms_bpd"]), golden["terms_bpd"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["total_bpd"]), golden["total_bpd"], rtol=1e-3, atol=1e-3
    )

    # canary: a wrong t=0 boundary (KL instead of decoder NLL) must be caught
    wrong = np_bpd_golden(
        np_tables(np.asarray(model.sampler.constants.betas)),
        x,
        replayed_noises(key, x.shape),
        np_eps,
        wrong_t0=True,
    )
    assert np.abs(wrong["total_bpd"] - np.asarray(got["total_bpd"])).max() > 0.05


def test_bpd_matches_numpy_golden_learned_variance():
    model = ImprovedDDPM(
        cfg=model_cfg("diffusion_model_nemo.modules.LearnedGaussianDiffusion")
    )
    x = quantized_x_start(1)
    key = jax.random.PRNGKey(5)

    def model_fn(params, xb, tb):
        tf = tb.astype(jnp.float32).reshape(-1, 1, 1, 1)
        eps = jnp.tanh(0.7 * xb) * (0.8 + 0.2 * jnp.cos(0.3 * tf))
        v = jnp.sin(0.5 * xb + 0.1 * tf)
        return jnp.concatenate([eps, v], axis=-1)

    got = model.calculate_bits_per_dimension(
        jnp.asarray(x), params={}, key=key, model_fn=model_fn
    )
    golden = np_bpd_golden(
        np_tables(np.asarray(model.sampler.constants.betas)),
        x,
        replayed_noises(key, x.shape),
        np_eps,
        logvar_fn=np_vfrac,
    )
    np.testing.assert_allclose(
        np.asarray(got["terms_bpd"]), golden["terms_bpd"], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["total_bpd"]), golden["total_bpd"], rtol=1e-3, atol=1e-3
    )
