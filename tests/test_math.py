"""Golden tests for numerics helpers (reference utils.py formulas)."""

import math

import numpy as np
import jax.numpy as jnp

from diffusion_model_nemo_tpu.ops.math import (
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    mean_flattened,
    normal_kl,
    num_to_groups,
    sum_flattened,
)


def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3, -1.0])
    lv = jnp.array([0.1, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)


def test_normal_kl_closed_form():
    # KL(N(1, e^0) || N(0, e^0)) = 0.5
    kl = normal_kl(1.0, 0.0, 0.0, 0.0)
    assert np.isclose(float(kl), 0.5)


def test_approx_cdf_midpoint_and_tails():
    assert np.isclose(float(approx_standard_normal_cdf(jnp.array(0.0))), 0.5)
    assert float(approx_standard_normal_cdf(jnp.array(6.0))) > 0.999
    assert float(approx_standard_normal_cdf(jnp.array(-6.0))) < 0.001


def test_discretized_gaussian_ll_sums_to_one():
    """Sum of bin probabilities over all 256 levels ≈ 1 for a centered Gaussian."""
    levels = jnp.linspace(-1.0, 1.0, 256)
    means = jnp.zeros_like(levels)
    log_scales = jnp.full_like(levels, math.log(0.2))
    ll = discretized_gaussian_log_likelihood(levels, means=means, log_scales=log_scales)
    total = float(jnp.exp(ll).sum())
    assert 0.98 < total < 1.02


def test_flattened_reductions():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    np.testing.assert_allclose(np.asarray(mean_flattened(x)), x.reshape(2, -1).mean(-1))
    np.testing.assert_allclose(np.asarray(sum_flattened(x)), x.reshape(2, -1).sum(-1))


def test_num_to_groups():
    assert num_to_groups(10, 4) == [4, 4, 2]
    assert num_to_groups(8, 4) == [4, 4]
