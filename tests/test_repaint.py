"""RePaint inpainting (modules/repaint.py, DDPM.inpaint) — Lugmayr et al. 2022.

Correctness anchors:
  1. Schedule structure: the jump schedule matches a hand-rolled RePaint
     ``get_schedule_jump`` (levels stay in range, net descent T, reverse
     count = expected NFE, jump_n_sample=1 degenerates to the plain chain).
  2. Fully-known mask: the output equals the ground truth exactly — for ANY
     network — because every blend keeps the known region and the final
     blend uses the clean image.
  3. Analytic single-point field: with eps-hat = (x_t - sqrt(acp) x0*)/sqrt(1-acp)
     the reverse chain contracts to x0*; the inpainted hole lands on x0*
     while the known half keeps the (different) ground truth.
  4. Determinism + mask semantics: same key -> same output; the known region
     is bit-exact against the input; a soft mask blends.
  5. Model e2e: DDPM.inpaint on a tiny net (shape/finite/known-region-exact),
     DDIM-configured sampler still inpaints (ancestral table retained),
     rectified-flow models are rejected loudly; mesh-sharded inpaint matches
     unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import GaussianDiffusion, repaint_loop, repaint_schedule

IMG = 8
T = 20


def _process(timesteps=T):
    return GaussianDiffusion(timesteps=timesteps, schedule_name="linear")


def _point_field(process, x0_star):
    """eps-hat for a point-mass data distribution at x0*: inverting
    q_sample gives eps = (x_t - sqrt(acp_t) x0*)/sqrt(1-acp_t)."""
    c = process.constants
    x0s = jnp.asarray(x0_star, jnp.float32)

    def fn(params, x, t):
        a = c.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        s = c.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - a * x0s) / jnp.maximum(s, 1e-8)

    return fn


# ---- 1. schedule ----------------------------------------------------------------------
def test_schedule_plain_chain_when_no_resampling():
    t_op, is_rev = repaint_schedule(T, jump_length=10, jump_n_sample=1)
    np.testing.assert_array_equal(t_op, np.arange(T - 1, -1, -1))
    assert is_rev.all()
    t_op0, is_rev0 = repaint_schedule(T, jump_length=0, jump_n_sample=5)
    np.testing.assert_array_equal(t_op0, np.arange(T - 1, -1, -1))


def test_schedule_structure_with_jumps():
    j, r = 2, 3
    t_op, is_rev = repaint_schedule(T, jump_length=j, jump_n_sample=r)
    # level trace: reverse at t takes level t+1 -> t ... simulate and check
    level = T
    for t, rev in zip(t_op.tolist(), is_rev.tolist()):
        if rev:
            assert level == t + 1, (level, t)
            level = t
        else:
            assert level == t - 1, (level, t)  # forward re-noises t-1 -> t
            level = t
        assert 0 <= level <= T
    assert level == 0  # chain ends at the data level
    # every anchor below T - j is redone (r - 1) times, each redo adds j
    # forward + j extra reverse ops
    n_anchors = len(range(0, T - j, j))
    assert int(is_rev.sum()) == T + n_anchors * (r - 1) * j
    assert int((~is_rev).sum()) == n_anchors * (r - 1) * j
    # forward ops always use t >= 1 (beta_0 re-noising never happens from level -1)
    assert t_op[~is_rev].min() >= 1


# ---- 2. fully-known mask --------------------------------------------------------------
def test_full_mask_returns_ground_truth_for_any_net():
    p = _process()

    def garbage_net(params, x, t):
        return jnp.full_like(x, 7.7)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.uniform(-1, 1, (2, IMG, IMG, 1)), jnp.float32)
    out = repaint_loop(
        p, garbage_net, None, y, jnp.ones_like(y), jax.random.PRNGKey(0),
        jump_length=5, jump_n_sample=2, unnormalize=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), atol=1e-6)


# ---- 3. analytic hole fill ---------------------------------------------------------------
def test_hole_fills_toward_point_mass():
    p = _process(timesteps=100)
    x0_star = 0.4
    fn = _point_field(p, np.full((1, IMG, IMG, 1), x0_star, np.float32))

    y = jnp.full((2, IMG, IMG, 1), -0.6, jnp.float32)  # known half differs from x0*
    mask = jnp.zeros((1, IMG, IMG, 1), jnp.float32).at[:, : IMG // 2].set(1.0)
    out = repaint_loop(
        p, fn, None, y, mask, jax.random.PRNGKey(1),
        jump_length=10, jump_n_sample=3, unnormalize=False,
    )
    out = np.asarray(out)
    # known rows exact
    np.testing.assert_allclose(out[:, : IMG // 2], -0.6, atol=1e-6)
    # hole contracts to the model's point mass (ancestral chain is stochastic
    # only through the t>0 noise; the final step is the posterior mean)
    assert abs(out[:, IMG // 2 :].mean() - x0_star) < 0.05
    assert out[:, IMG // 2 :].std() < 0.1


def test_determinism_and_soft_mask():
    p = _process()
    fn = _point_field(p, np.zeros((1, IMG, IMG, 1), np.float32))
    y = jnp.full((1, IMG, IMG, 1), 0.8, jnp.float32)
    mask = jnp.full((1, IMG, IMG, 1), 1.0, jnp.float32)
    a = repaint_loop(p, fn, None, y, mask, jax.random.PRNGKey(3), unnormalize=False)
    b = repaint_loop(p, fn, None, y, mask, jax.random.PRNGKey(3), unnormalize=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---- 5. model e2e ----------------------------------------------------------------------
def _tiny_cfg(sampler_target="diffusion_model_nemo.modules.GaussianDiffusion", **samp):
    cfg = {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 10,
        "compute_bpd": False,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": sampler_target,
            "timesteps": 10,
            "schedule_name": "linear",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }
    cfg["sampler"].update(samp)
    return cfg


def test_model_inpaint_surface():
    from diffusion_model_nemo_tpu.models import DDPM

    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))

    y = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (2, IMG, IMG, 1)), 0.0, 1.0
    )
    mask = jnp.zeros((2, IMG, IMG, 1)).at[:, :, : IMG // 2].set(1.0)
    out = model.inpaint(y, mask, key=jax.random.PRNGKey(2), jump_length=3, jump_n_sample=2)
    out = np.asarray(out)
    assert out.shape == (2, IMG, IMG, 1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(
        out[:, :, : IMG // 2], np.asarray(y)[:, :, : IMG // 2], atol=1e-5
    )

    # DDIM-configured sampler retains the ancestral table -> still inpaints
    cfg = _tiny_cfg("diffusion_model_nemo.modules.GeneralizedGaussianDiffusion")
    cfg["sampler"]["ddim_timesteps"] = 5
    ddim_model = DDPM(cfg=cfg)
    ddim_model.init_params(jax.random.PRNGKey(0))
    out2 = ddim_model.inpaint(y, mask, key=jax.random.PRNGKey(2), jump_n_sample=1)
    assert np.isfinite(np.asarray(out2)).all()


def test_flow_model_rejected():
    from diffusion_model_nemo_tpu.models import RectifiedFlow

    cfg = _tiny_cfg("diffusion_model_nemo.modules.RectifiedFlowProcess")
    cfg["sampler"] = {
        "_target_": "diffusion_model_nemo.modules.RectifiedFlowProcess",
        "sample_steps": 4,
    }
    model = RectifiedFlow(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    # RectifiedFlow does not define inpaint; the DDPM surface rejects non-ancestral samplers
    from diffusion_model_nemo_tpu.models import DDPM

    ddpm_cfg = _tiny_cfg()
    m = DDPM(cfg=ddpm_cfg)
    m.init_params(jax.random.PRNGKey(0))
    m.sampler = model.sampler  # simulate a hot-swap to a non-ancestral process
    with pytest.raises(ValueError):
        m.inpaint(jnp.zeros((1, IMG, IMG, 1)), jnp.ones((1, IMG, IMG, 1)))


def test_mesh_sharded_inpaint_matches():
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.parallel import make_mesh

    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    y = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (16, IMG, IMG, 1)), 0.0, 1.0
    )
    mask = jnp.zeros((16, IMG, IMG, 1)).at[:, :, : IMG // 2].set(1.0)
    key = jax.random.PRNGKey(5)
    plain = model.inpaint(y, mask, key=key, jump_length=3, jump_n_sample=2)

    mesh = make_mesh(jax.devices()[:8])
    sharded = model.inpaint(y, mask, key=key, jump_length=3, jump_n_sample=2, mesh=mesh)
    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
