"""SDE library: marginals, priors, discretizations, PC sampler, likelihood."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.modules import (
    LikelihoodEstimate,
    PredictorCorrectorSampler,
    ProbabilityFlowSampler,
    VESDE,
    VPSDE,
    subVPSDE,
)
from diffusion_model_nemo_tpu.modules.sde_lib.score_fn import resolve_score_function


def zero_model(params, x, t):
    return jnp.zeros_like(x)


def test_vpsde_marginal_prob_closed_form():
    sde = VPSDE(beta_min=0.1, beta_max=20, N=100)
    t = jnp.array([0.0, 0.5, 1.0])
    x = jnp.ones((3, 2, 2, 1))
    mean, std = sde.marginal_prob(x, t)
    lmc = -0.25 * t**2 * (20 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(
        np.asarray(mean[:, 0, 0, 0]), np.exp(np.asarray(lmc)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(std), np.sqrt(1 - np.exp(2 * np.asarray(lmc))), rtol=1e-4
    )
    # t→1: nearly standard normal marginal
    assert float(std[-1]) > 0.99


def test_vesde_geometric_sigma():
    sde = VESDE(sigma_min=0.01, sigma_max=50, N=10)
    t = jnp.array([0.0, 1.0])
    _, std = sde.marginal_prob(jnp.zeros((2, 1, 1, 1)), t)
    np.testing.assert_allclose(np.asarray(std), [0.01, 50.0], rtol=1e-5)


def test_prior_logp_standard_normal():
    sde = VPSDE(N=10)
    z = jnp.zeros((1, 2, 2, 1))
    # logp of 0 under N(0, I): -N/2 log(2π)
    expected = -4 / 2 * math.log(2 * math.pi)
    np.testing.assert_allclose(float(sde.prior_logp(z)[0]), expected, rtol=1e-6)


def test_vpsde_discretize_matches_tables():
    sde = VPSDE(N=10)
    x = jnp.ones((2, 2, 2, 1))
    t = jnp.array([0.0, 1.0])
    f, G = sde.discretize(x, t)
    np.testing.assert_allclose(float(G[0]), float(jnp.sqrt(sde.betas[0])), rtol=1e-6)
    np.testing.assert_allclose(float(G[1]), float(jnp.sqrt(sde.betas[9])), rtol=1e-6)


def test_score_adapter_vp_scaling():
    """VP adapter: score = -model_out / std(t)."""
    sde = VPSDE(N=100)
    captured = {}

    def model(params, x, labels):
        captured["labels"] = labels
        return jnp.ones_like(x)

    score_fn = resolve_score_function(model, sde, continuous=True)
    t = jnp.array([0.5, 0.5])
    out = score_fn(None, jnp.zeros((2, 2, 2, 1)), t)
    _, std = sde.marginal_prob(jnp.zeros((2, 2, 2, 1)), t)
    np.testing.assert_allclose(
        np.asarray(out), -1.0 / np.asarray(std).reshape(-1, 1, 1, 1) * np.ones((2, 2, 2, 1)), rtol=1e-5
    )
    # time label is t*(N-1)
    np.testing.assert_allclose(np.asarray(captured["labels"]), 0.5 * 99, rtol=1e-6)


def test_score_adapter_ve_labels():
    sde = VESDE(N=100)
    captured = {}

    def model(params, x, labels):
        captured["labels"] = labels
        return jnp.ones_like(x)

    score_fn = resolve_score_function(model, sde, continuous=True)
    t = jnp.array([0.3])
    score_fn(None, jnp.zeros((1, 2, 2, 1)), t)
    _, sigma = sde.marginal_prob(jnp.zeros((1, 2, 2, 1)), t)
    np.testing.assert_allclose(np.asarray(captured["labels"]), np.asarray(sigma), rtol=1e-6)


@pytest.mark.parametrize("predictor,corrector", [
    ("reverse_diffusion", "langevin"),
    ("euler_maruyama", None),
    ("ancestral_sampling", "ald"),
])
def test_pc_sampler_combinations(predictor, corrector, rng):
    # N must be large enough that beta_max/N < 1 (else discrete alphas go
    # negative — true of the reference's tables too).
    sde = VPSDE(N=50)
    pc = PredictorCorrectorSampler(
        predictor=predictor, corrector=corrector, snr=0.16, n_steps=1
    )
    pc.update_sde(sde)
    # langevin scales its step by 1/grad_norm — a zero score would divide by
    # zero (true of the reference too), so use a small constant score model.
    model = lambda params, x, t: jnp.ones_like(x) * 0.1
    out, nfe = pc.sample(model, None, (2, 4, 4, 1), rng, return_nfe=True)
    assert out.shape == (2, 4, 4, 1)
    assert nfe == 50 * 2
    assert np.all(np.isfinite(np.asarray(out)))


def test_pc_sampler_frames(rng):
    sde = VESDE(N=4)
    pc = PredictorCorrectorSampler(predictor="reverse_diffusion", corrector=None, snr=0.1)
    pc.update_sde(sde)
    out, frames = pc.sample(zero_model, None, (1, 4, 4, 1), rng, return_frames=True)
    assert frames.shape == (4, 1, 4, 4, 1)


def test_probability_flow_sampler(rng):
    sde = VPSDE(N=100)
    pf = ProbabilityFlowSampler(denoise=True, max_steps=1000)
    pf.update_sde(sde)
    out, nfe = jax.jit(
        lambda k: pf.sample(zero_model, None, (2, 4, 4, 1), k, return_nfe=True)
    )(rng)
    assert out.shape == (2, 4, 4, 1)
    assert int(nfe) > 0
    assert np.all(np.isfinite(np.asarray(out)))


def test_likelihood_gaussian_data_nfe_and_shape(rng):
    """With a zero score model on VPSDE, the ODE drift is linear; bits/dim of
    standard-normal data should be finite and the NFE counted."""
    sde = VPSDE(N=100)
    lk = LikelihoodEstimate(max_steps=2000)
    lk.update_sde(sde)
    data = jax.random.normal(rng, (2, 4, 4, 1)) * 0.5
    bpd, z, nfe = jax.jit(lambda d, k: lk.likelihood(zero_model, None, d, k))(
        data, jax.random.fold_in(rng, 1)
    )
    assert bpd.shape == (2,)
    assert np.all(np.isfinite(np.asarray(bpd)))
    assert int(nfe) > 0
    assert z.shape == data.shape
