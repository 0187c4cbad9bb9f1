"""UniPC sampler (modules/unipc.py).

Correctness anchors:
  1. Order-1 without the corrector is analytically DDIM (eta=0): bitwise
     match against the DDIM gather-path scan on an analytic epsilon-field.
  2. Order-2 / variant "bh2" without the corrector is algebraically
     DPM-Solver++(2M) (derivation in the module docstring): bitwise match
     against modules/dpm_solver.py on the same grid.
  3. On a constant-x0 field the variation-of-constants integral is exact at
     every order, corrector included — the chain must land on x0* through
     the alpha_bar=1 endpoint.
  4. The corrector (UniC) must reduce integration error against the exact
     variation-of-constants integral for a smooth x0(t) field at zero extra
     NFE, with superlinear step-scaling — exercised through the same
     host-precomputed coefficient vectors the scan consumes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import (
    DPMSolverDiffusion,
    GeneralizedGaussianDiffusion,
    UniPCDiffusion,
)

T = 100
IMG = 8


def _const_x0_model(acp):
    """epsilon-field whose implied x0 is a fixed image in [-0.5, 0.5]."""
    x0_star = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (1, IMG, IMG, 1)), jnp.float32
    )

    def model_fn(params, x, t):
        a = jnp.take(acp, t.astype(jnp.int32))[:, None, None, None]
        return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1.0 - a)

    return model_fn, x0_star


def test_order1_matches_ddim_exactly():
    uni = UniPCDiffusion(
        timesteps=T, schedule_name="cosine", solver_steps=10, solver_order=1,
        use_corrector=False,
    )
    ddim = GeneralizedGaussianDiffusion(
        timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=10
    )
    model_fn, _ = _const_x0_model(uni.constants.alphas_cumprod)
    key = jax.random.PRNGKey(3)
    shape = (2, IMG, IMG, 1)
    init = jax.random.normal(jax.random.PRNGKey(9), shape)
    a = uni.p_sample_loop(model_fn, None, shape, key, img=init)
    b = ddim.p_sample_loop(model_fn, None, shape, key, img=init)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_order2_bh2_matches_dpm_solver_exactly():
    uni = UniPCDiffusion(
        timesteps=T, schedule_name="linear", solver_steps=8, solver_order=2,
        variant="bh2", use_corrector=False,
    )
    dpm = DPMSolverDiffusion(
        timesteps=T, schedule_name="linear", solver_steps=8, solver_order=2
    )
    model_fn, _ = _const_x0_model(uni.constants.alphas_cumprod)
    key = jax.random.PRNGKey(3)
    shape = (2, IMG, IMG, 1)
    init = jax.random.normal(jax.random.PRNGKey(9), shape)
    a = uni.p_sample_loop(model_fn, None, shape, key, img=init)
    b = dpm.p_sample_loop(model_fn, None, shape, key, img=init)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_corrector_chain_recovers_constant_x0(order):
    uni = UniPCDiffusion(
        timesteps=T, schedule_name="linear", solver_steps=8, solver_order=order,
        use_corrector=True,
    )
    model_fn, x0_star = _const_x0_model(uni.constants.alphas_cumprod)
    shape = (2, IMG, IMG, 1)
    out = uni.p_sample_loop(
        model_fn, None, shape, jax.random.PRNGKey(0), unnormalize=False
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(x0_star), shape), atol=1e-4
    )


def _scalar_run(steps, order, corrector, exact_ctx):
    """Numpy replica of the scan body over the precomputed coefficients on a
    smooth x-independent x0-field, returning |error| vs the exact integral."""
    T_, exact = exact_ctx
    s = UniPCDiffusion(
        timesteps=T_, schedule_name="cosine", solver_steps=steps,
        solver_order=order, use_corrector=corrector, clip_denoised=False,
        time_spacing="logsnr", objective="pred_x0",
    )
    c = {k: np.asarray(v, np.float64) for k, v in s._unipc_coefficients().items()}
    M = len(c["t"]) - 1  # drop the alpha_bar=1 endpoint (infinite lambda)
    x, x_last, m1, m2, m3 = 1.0, 0.0, 0.0, 0.0, 0.0
    for i in range(M):
        m0 = np.sin(2 * np.pi * c["t"][i] / T_)
        x_corr = (
            c["c_cx"][i] * x_last + c["c_cm"][i] * m1
            + c["cw0"][i] * (m2 - m1) + c["cw1"][i] * (m3 - m1)
            + c["cwt"][i] * (m0 - m1)
        )
        x_used = x_corr if c["g"][i] > 0 else x
        x = (
            c["p_cx"][i] * x_used + c["p_cm"][i] * m0
            + c["pw0"][i] * (m1 - m0) + c["pw1"][i] * (m2 - m0)
        )
        x_last, m1, m2, m3 = x_used, m0, m1, m2
    return abs(x - exact)


def test_corrector_raises_accuracy_at_zero_extra_nfe():
    from scipy.integrate import quad

    T_ = 1000
    probe = UniPCDiffusion(
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
    ctx = (T_, (s_t / s_s) * 1.0 + s_t * integral)

    for steps in (40, 80):
        e_plain = _scalar_run(steps, 2, False, ctx)
        e_corr = _scalar_run(steps, 2, True, ctx)
        assert e_corr < 0.55 * e_plain, (
            f"steps={steps}: UniC {e_corr} not < 0.55 * plain order-2 {e_plain}"
        )
    # superlinear: quadrupling the steps cuts the corrected error >= 16x
    assert _scalar_run(80, 2, True, ctx) < _scalar_run(20, 2, True, ctx) / 16.0


def test_model_integration_change_sampler():
    """DDPM.change_sampler to UniPC; cached-jit sample e2e, frames + mesh."""
    from diffusion_model_nemo_tpu.parallel.mesh import make_mesh
    from tests.test_serving import tiny_model

    model = tiny_model()
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.UniPCDiffusion"
    sampler_cfg["solver_steps"] = 5  # the tiny model's full T (stride 1)
    sampler_cfg["solver_order"] = 3
    model.change_sampler(sampler_cfg)
    out, frames = model.sample(
        batch_size=2, image_size=IMG, key=jax.random.PRNGKey(1), return_frames=True
    )
    assert out.shape == (2, IMG, IMG, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert frames.shape[0] == 5 and frames.shape[1:] == (2, IMG, IMG, 1)

    plain = model.sample(batch_size=16, image_size=IMG, key=jax.random.PRNGKey(2))
    model._jit_cache.clear()
    sharded = model.sample(
        batch_size=16, image_size=IMG, key=jax.random.PRNGKey(2), mesh=make_mesh()
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_pred_v_objective_runs_finite():
    uni = UniPCDiffusion(
        timesteps=T, schedule_name="cosine", solver_steps=6, solver_order=2,
        objective="pred_v",
    )
    acp = uni.constants.alphas_cumprod

    def v_model(params, x, t):
        return 0.1 * x  # arbitrary smooth v-field

    out = uni.p_sample_loop(v_model, None, (2, IMG, IMG, 1), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_validation_errors():
    with pytest.raises(ValueError, match="solver_order"):
        UniPCDiffusion(timesteps=T, schedule_name="linear", solver_order=4)
    with pytest.raises(ValueError, match="variant"):
        UniPCDiffusion(timesteps=T, schedule_name="linear", variant="bh3")
