"""EDM / Karras sampler (beyond-reference; Karras et al. 2022).

Correctness anchors:
  1. Euler (order=1) on the DDIM grid IS the DDIM eta=0 sampler — exact
     lockstep on an analytic epsilon-field whose x0 stays in the clip range.
  2. Heun (order=2) shows second-order convergence against the closed-form
     probability-flow solution of a Gaussian data distribution, and beats
     Euler at equal step count.
  3. pred_v: the v-converted field reproduces the pred_noise path.
  4. Stochastic churn is reproducible under a fixed key and inert at
     s_churn=0; grid endpoints follow Karras eq. (5).
  5. change_sampler integration: a DDPM hot-swaps to KarrasDiffusion via the
     registry target and samples finitely (frames included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import (
    GeneralizedGaussianDiffusion,
    KarrasDiffusion,
)

T = 50
IMG = 8


def _lam_table(kd):
    acp = np.asarray(kd.constants.alphas_cumprod, np.float64)
    return 0.5 * (np.log1p(-acp) - np.log(acp))


def _gaussian_field_int_t(acp_ext, m=0.05, s=0.2):
    """Exact epsilon-field of a Gaussian data distribution N(m, s^2 I), for
    integer conditioning times (extended-alpha grid).  x0 is a convex
    combination of x^ and m, so it stays within the clip range for |z| < ~4
    — DDIM's unconditional clip and Karras clip_denoised are both no-ops."""

    def eps_fn(params, x, t):
        a = jnp.take(acp_ext, t.astype(jnp.int32) + 1)[:, None, None, None]
        sig = jnp.sqrt((1.0 - a) / a)
        xhat = x / jnp.sqrt(a)
        x0 = (s * s * xhat + sig * sig * m) / (s * s + sig * sig)
        return (xhat - x0) / sig

    return eps_fn


def _gaussian_field_interp_t(lam, timesteps, m=0.0, s=0.2):
    """Same field for fractional conditioning times: sigma^ is recovered by
    the exact piecewise-linear inverse of the sampler's log-sigma interp."""
    lam_j = jnp.asarray(lam, jnp.float32)
    ts = jnp.arange(timesteps, dtype=jnp.float32)

    def eps_fn(params, x, t):
        sig = jnp.exp(jnp.interp(t, ts, lam_j))[:, None, None, None]
        xhat = x * jnp.sqrt(1.0 + sig * sig)
        x0 = (s * s * xhat + sig * sig * m) / (s * s + sig * sig)
        return (xhat - x0) / sig

    return eps_fn


def test_euler_on_ddim_grid_is_ddim_eta0():
    dd = GeneralizedGaussianDiffusion(
        timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=10
    )
    kd = KarrasDiffusion(
        timesteps=T,
        schedule_name="cosine",
        solver_steps=10,
        solver_order=1,
        grid="ddim",
    )
    eps_fn = _gaussian_field_int_t(dd.alphas_extended_cumprod)

    shape = (2, IMG, IMG, 1)
    z = jax.random.normal(jax.random.PRNGKey(3), shape)
    # same physical start: DDIM takes x_t (model space), Karras takes x^ = x_t/a
    seq, _ = dd._strided_sequences()
    acp0 = float(np.asarray(dd.alphas_extended_cumprod)[seq[0] + 1])
    key = jax.random.PRNGKey(5)
    a = dd.p_sample_loop(eps_fn, None, shape, key, img=z)
    b = kd.p_sample_loop(eps_fn, None, shape, key, img=z / np.sqrt(acp0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def _run_karras(order, steps, z, m, s, smin=0.05, smax=10.0, timesteps=1000):
    kd = KarrasDiffusion(
        timesteps=timesteps,
        schedule_name="cosine",
        solver_steps=steps,
        solver_order=order,
        grid="karras",
        sigma_min=smin,
        sigma_max=smax,
        clip_denoised=False,
    )
    eps_fn = _gaussian_field_interp_t(_lam_table(kd), timesteps, m=m, s=s)
    out = kd.p_sample_loop(
        eps_fn, None, z.shape, jax.random.PRNGKey(0), img=z * smax, unnormalize=False
    )
    # closed form: x^(0) = m + (x^_0 - m) * s / sqrt(s^2 + smax^2)
    exact = m + (np.asarray(z) * smax - m) * s / np.sqrt(s * s + smax * smax)
    return float(np.max(np.abs(np.asarray(out) - exact)))


def test_heun_second_order_convergence():
    # sigma_min small enough that the fixed final Euler step (sigma_min -> 0,
    # EDM Algorithm 2's own boundary) is below the measured method error
    z = jax.random.normal(jax.random.PRNGKey(11), (2, IMG, IMG, 1))
    m, s, smin = 0.0, 0.2, 0.005
    err_e16 = _run_karras(1, 16, z, m, s, smin=smin)
    err_h8 = _run_karras(2, 8, z, m, s, smin=smin)
    err_h16 = _run_karras(2, 16, z, m, s, smin=smin)
    err_h32 = _run_karras(2, 32, z, m, s, smin=smin)
    assert err_h16 < 0.5 * err_e16, (err_h16, err_e16)
    # halving h should cut the global error ~4x for a 2nd-order method
    # (rho-spaced grid, so allow slack; measured ratios are ~5x)
    assert err_h8 / max(err_h16, 1e-12) > 3.0, (err_h8, err_h16)
    assert err_h16 / max(err_h32, 1e-12) > 3.0, (err_h16, err_h32)


def test_pred_v_matches_pred_noise():
    common = dict(
        timesteps=T,
        schedule_name="cosine",
        solver_steps=8,
        solver_order=2,
        grid="karras",
    )
    kd_eps = KarrasDiffusion(objective="pred_noise", **common)
    kd_v = KarrasDiffusion(objective="pred_v", **common)
    lam = _lam_table(kd_eps)
    eps_fn = _gaussian_field_interp_t(lam, T, m=0.05, s=0.25)

    lam_j = jnp.asarray(lam, jnp.float32)
    ts = jnp.arange(T, dtype=jnp.float32)

    def v_fn(params, x, t):
        sig = jnp.exp(jnp.interp(t, ts, lam_j))[:, None, None, None]
        a = 1.0 / jnp.sqrt(1.0 + sig * sig)
        eps = eps_fn(params, x, t)
        xhat = x / a
        x0 = xhat - sig * eps
        return a * eps - (sig * a) * x0  # v = a*eps - s*x0

    shape = (2, IMG, IMG, 1)
    key = jax.random.PRNGKey(13)
    a = kd_eps.p_sample_loop(eps_fn, None, shape, key)
    b = kd_v.p_sample_loop(v_fn, None, shape, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_churn_reproducible_and_zero_inert():
    common = dict(
        timesteps=T, schedule_name="cosine", solver_steps=6, solver_order=2
    )
    kd0 = KarrasDiffusion(s_churn=0.0, **common)
    kd1 = KarrasDiffusion(s_churn=2.0, **common)
    eps_fn = _gaussian_field_interp_t(_lam_table(kd0), T)
    shape = (2, IMG, IMG, 1)
    key = jax.random.PRNGKey(17)

    a1 = kd1.p_sample_loop(eps_fn, None, shape, key)
    a2 = kd1.p_sample_loop(eps_fn, None, shape, key)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.all(np.isfinite(np.asarray(a1)))

    b = kd0.p_sample_loop(eps_fn, None, shape, key)
    assert np.all(np.isfinite(np.asarray(b)))
    # churn injects noise the deterministic path does not
    assert not np.allclose(np.asarray(a1), np.asarray(b), atol=1e-5)


def test_karras_grid_endpoints():
    kd = KarrasDiffusion(
        timesteps=T,
        schedule_name="linear",
        solver_steps=12,
        sigma_min=0.1,
        sigma_max=40.0,
        rho=7.0,
    )
    sig, t_cond = kd._sigma_grid()
    assert len(sig) == 13 and sig[-1] == 0.0
    np.testing.assert_allclose(sig[0], 40.0, rtol=1e-12)
    np.testing.assert_allclose(sig[-2], 0.1, rtol=1e-12)
    assert np.all(np.diff(sig) < 0)
    assert np.all((t_cond[:-1] >= 0) & (t_cond[:-1] <= T - 1))


def test_change_sampler_integration():
    from diffusion_model_nemo_tpu.models import DDPM

    cfg = {
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
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    model.change_sampler(
        {
            "_target_": "diffusion_model_nemo.modules.KarrasDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
            "solver_steps": 4,
            "solver_order": 2,
            "s_churn": 1.0,
        }
    )
    out, frames = model.sample(
        batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1), return_frames=True
    )
    assert out.shape == (2, IMG, IMG, 1)
    assert frames.shape == (4, 2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))
