"""Golden tests for beta schedules and the constant table.

Expected values are computed from the closed forms the reference implements
(diffusion_process.py:8-36, gaussian_diffusion.py:44-83).
"""

import math

import numpy as np
import pytest

from diffusion_model_nemo_tpu.ops.schedules import (
    ScheduleConstants,
    compute_schedule_constants,
    cosine_beta_schedule,
    extract,
    get_named_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)

import jax.numpy as jnp


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert np.isclose(betas[0], 1e-4)
    assert np.isclose(betas[-1], 0.02)
    assert np.all(np.diff(betas) > 0)


def test_quadratic_schedule_matches_formula():
    T = 100
    betas = quadratic_beta_schedule(T, 1e-4, 0.02)
    lin = np.linspace(1e-4**0.5, 0.02**0.5, T) ** 2
    np.testing.assert_allclose(betas, lin, rtol=1e-6)


def test_sigmoid_schedule_range():
    betas = sigmoid_beta_schedule(50)
    assert betas.min() >= 1e-4 - 1e-8
    assert betas.max() <= 0.02 + 1e-8


def test_cosine_schedule_formula():
    T = 64
    s = 0.008
    steps = np.linspace(0, T, T + 1)
    ac = np.cos(((steps / T) + s) / (1 + s) * math.pi / 2) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 1e-4, 0.999)
    np.testing.assert_allclose(cosine_beta_schedule(T), expected, rtol=1e-5)


def test_named_schedule_with_nested_cfg():
    cfg = {"linear": {"beta_start": 0.001, "beta_end": 0.01}, "cosine": {"s": 0.008}}
    betas = get_named_beta_schedule("linear", 10, cfg)
    assert np.isclose(betas[0], 0.001) and np.isclose(betas[-1], 0.01)


def test_constant_table_identities():
    c = compute_schedule_constants(100, "linear")
    betas = np.asarray(c.betas, dtype=np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(c.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c.alphas_cumprod_prev)[1:], acp[:-1], rtol=1e-5)
    assert np.asarray(c.alphas_cumprod_prev)[0] == 1.0
    np.testing.assert_allclose(
        np.asarray(c.sqrt_one_minus_alphas_cumprod) ** 2 + np.asarray(c.sqrt_alphas_cumprod) ** 2,
        1.0,
        atol=1e-5,
    )
    # posterior variance: beta_t * (1 - acp_prev) / (1 - acp)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    pv = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(c.posterior_variance), pv, rtol=1e-5)
    # log clipped: first element equals second
    plvc = np.asarray(c.posterior_log_variance_clipped)
    assert plvc[0] == plvc[1]
    # wavegrad extras
    assert c.sqrt_alphas_cumprod_prev.shape == (101,)
    np.testing.assert_allclose(
        np.asarray(c.sqrt_alphas_cumprod_m1),
        np.sqrt(1 - acp) / np.sqrt(acp),
        rtol=1e-4,
    )


def test_extract_gather_broadcast():
    table = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(table, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])


def test_invalid_schedule_rejected():
    with pytest.raises(ValueError):
        get_named_beta_schedule("nope", 10)
