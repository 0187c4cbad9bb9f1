"""DPM-Solver++ (2M) sampler (modules/dpm_solver.py).

Correctness anchors:
  1. Order-1 is analytically identical to DDIM (eta=0) — proven in the
     module docstring — so on an analytic epsilon-field where clipping is
     inactive, the precomputed-coefficient scan must reproduce the DDIM
     gather-path scan exactly.
  2. Order-2's multistep correction must beat order-1 against a fine-grid
     reference on a real (random-weight) U-Net at few steps.
  3. The data endpoint (alpha_bar = 1, infinite h) is handled by
     lower-order fallback: outputs are finite, and for a model whose x0
     prediction is a constant image the chain recovers it exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import (
    DPMSolverDiffusion,
    GeneralizedGaussianDiffusion,
)

T = 100
IMG = 8


def _const_x0_model(acp):
    """epsilon-field whose implied x0 is a fixed image in [-0.5, 0.5]:
    eps(x, t) = (x - sqrt(acp_t) x0*) / sqrt(1 - acp_t). Clipping inactive."""
    x0_star = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (1, IMG, IMG, 1)), jnp.float32
    )

    def model_fn(params, x, t):
        a = jnp.take(acp, t.astype(jnp.int32))[:, None, None, None]
        return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1.0 - a)

    return model_fn, x0_star


def test_order1_matches_ddim_exactly():
    dpm = DPMSolverDiffusion(
        timesteps=T, schedule_name="cosine", solver_steps=10, solver_order=1
    )
    ddim = GeneralizedGaussianDiffusion(
        timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=10
    )
    model_fn, _ = _const_x0_model(dpm.constants.alphas_cumprod)
    key = jax.random.PRNGKey(3)
    shape = (2, IMG, IMG, 1)
    init = jax.random.normal(jax.random.PRNGKey(9), shape)

    a = dpm.p_sample_loop(model_fn, None, shape, key, img=init)
    b = ddim.p_sample_loop(model_fn, None, shape, key, img=init)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_order2_recovers_constant_x0_exactly():
    """On the constant-x0 field every order is exact; the chain must land on
    x0* (the alpha_bar=1 endpoint handled by the order-1 final step)."""
    dpm = DPMSolverDiffusion(
        timesteps=T, schedule_name="linear", solver_steps=8, solver_order=2
    )
    model_fn, x0_star = _const_x0_model(dpm.constants.alphas_cumprod)
    shape = (2, IMG, IMG, 1)
    out = dpm.p_sample_loop(
        model_fn, None, shape, jax.random.PRNGKey(0), unnormalize=False
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(x0_star), shape), atol=1e-4
    )


def test_order2_convergence_vs_closed_form():
    """Second-order convergence against the exact variation-of-constants
    integral  x_t = (sigma_t/sigma_s) x_s + sigma_t * int e^lambda x0(lambda) dlambda
    for a smooth x-independent x0-field x0hat(t) = sin(2 pi t / T)
    (pred_x0 objective). The final step to alpha_bar=1 is excluded so the
    comparison point (t=0) has a finite lambda; that endpoint step is pinned
    by test_order2_recovers_constant_x0_exactly instead.

    The multistep coefficients are exercised through _solver_coefficients
    (the same host-side vectors the scan consumes)."""
    from scipy.integrate import quad

    T_ = 1000
    probe = DPMSolverDiffusion(
        timesteps=T_, schedule_name="cosine", solver_steps=10,
        objective="pred_x0", time_spacing="logsnr",
    )
    acp = np.asarray(probe.constants.alphas_cumprod, np.float64)
    lam = 0.5 * (np.log(acp) - np.log1p(-acp))

    def t_of_lam(l):
        return np.interp(l, lam[::-1], np.arange(T_)[::-1].astype(float))

    ls, le = lam[T_ - 1], lam[0]
    s_s = np.sqrt(1.0 - acp[T_ - 1])
    s_t = np.sqrt(1.0 - acp[0])
    integral, _ = quad(
        lambda l: np.exp(l) * np.sin(2 * np.pi * t_of_lam(l) / T_), ls, le, limit=500
    )
    exact = (s_t / s_s) * 1.0 + s_t * integral  # from x(t=T-1) = 1

    def run(steps, order):
        s = DPMSolverDiffusion(
            timesteps=T_, schedule_name="cosine", solver_steps=steps,
            solver_order=order, clip_denoised=False, time_spacing="logsnr",
            objective="pred_x0",
        )
        c = {k: v[:-1] for k, v in s._solver_coefficients().items()}  # drop -1 step
        x, x0_prev = 1.0, 0.0
        for i in range(len(c["t"])):
            x0 = np.sin(2 * np.pi * c["t"][i] / T_)
            d = (1.0 - c["w_prev"][i]) * x0 + c["w_prev"][i] * x0_prev
            x = c["c_x"][i] * x + c["c_d"][i] * d
            x0_prev = x0
        return abs(x - exact)

    for steps in (20, 40, 80):
        e1, e2 = run(steps, 1), run(steps, 2)
        assert e2 < 0.6 * e1, f"steps={steps}: order-2 {e2} not < 0.6 * order-1 {e1}"
    # superlinear: quadrupling the steps cuts order-2 error ~10x or better
    assert run(80, 2) < run(20, 2) / 8.0


def test_logsnr_spacing_grid():
    dpm = DPMSolverDiffusion(
        timesteps=T, schedule_name="linear", solver_steps=12, time_spacing="logsnr"
    )
    seq, seq_next = dpm._solver_sequences()
    assert seq[-1] >= 0 and seq_next[-1] == -1
    assert (np.diff(seq) < 0).all()  # strictly descending
    assert (seq_next[:-1] == seq[1:]).all()  # a proper chain


def test_model_integration_change_sampler(tmp_path):
    """DDPM.change_sampler to the DPM solver; cached-jit sample e2e."""
    from tests.test_serving import tiny_model

    model = tiny_model()
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.DPMSolverDiffusion"
    sampler_cfg["solver_steps"] = 4
    sampler_cfg["solver_order"] = 2
    model.change_sampler(sampler_cfg)
    out = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(0))
    assert out.shape == (2, IMG, IMG, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_frames_and_mesh_sampling():
    from diffusion_model_nemo_tpu.parallel.mesh import make_mesh
    from tests.test_serving import tiny_model

    model = tiny_model()
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.DPMSolverDiffusion"
    sampler_cfg["solver_steps"] = 5  # the tiny model's full T (stride 1)
    model.change_sampler(sampler_cfg)
    out, frames = model.sample(
        batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1), return_frames=True
    )
    assert frames.shape[0] == 5 and frames.shape[1:] == (2, IMG, IMG, 1)

    plain = model.sample(batch_size=16, image_size=IMG, key=jax.random.PRNGKey(2))
    model._jit_cache.clear()
    sharded = model.sample(
        batch_size=16, image_size=IMG, key=jax.random.PRNGKey(2), mesh=make_mesh()
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
