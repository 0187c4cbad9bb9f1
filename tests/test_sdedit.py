"""SDEdit image-to-image editing (DDPM.edit) — Meng et al. 2022.

Correctness anchors:
  1. Composition pin: ``edit`` is BITWISE the manual q_sample-then-
     partial-reverse-chain composition under the same key split — the
     public surface adds nothing beyond the documented recipe.
  2. strength=0 is (up to the sqrt(1-acp_0) forward noise) the identity.
  3. Analytic single-point field: strength=1 contracts any input to x0*
     (ordinary sampling), while strength=0 ignores the field entirely.
  4. Determinism + validation: same key -> same output; strength outside
     [0, 1] and non-ancestral samplers are rejected loudly.
  5. Model e2e: tiny-net shape/finite, mesh-sharded edit matches unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.modules import GaussianDiffusion

IMG = 8
T = 50


def _tiny_cfg(timesteps=10):
    return {
        "image_size": IMG,
        "channels": 1,
        "timesteps": timesteps,
        "compute_bpd": False,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": timesteps,
            "schedule_name": "linear",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


def _point_field(process, x0_star):
    """eps-hat for a point-mass data distribution at x0* (inverted q_sample)."""
    c = process.constants
    x0s = jnp.asarray(x0_star, jnp.float32)

    def fn(params, x, t):
        t = jnp.asarray(t).reshape(-1)
        a = c.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        s = c.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - a * x0s) / jnp.maximum(s, 1e-8)

    return fn


# ---- 1. composition pin ---------------------------------------------------------------
def test_edit_is_the_documented_composition_bitwise():
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    sampler = model.sampler
    strength = 0.6
    t0 = int(round(strength * (model.timesteps - 1)))

    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (2, IMG, IMG, 1)), 0, 1)
    key = jax.random.PRNGKey(7)
    out = model.edit(y, strength=strength, key=key)

    # manual replay of the documented recipe under the same key split,
    # jitted as one graph exactly like the surface (XLA fusion differences
    # between an eager replay and the fused graph are ~1e-5 — the pin is
    # about the RECIPE, so compile the same program)
    model_fn = model.get_model_fn()

    @jax.jit
    def manual_fn(params, images, key):
        k_noise, k_loop = jax.random.split(key)
        x0 = images * 2.0 - 1.0
        t_b = jnp.full((2,), t0, jnp.int32)
        x_t0 = sampler.q_sample(
            x0, t_b, jax.random.normal(k_noise, images.shape, jnp.float32)
        )
        return sampler.p_sample_loop(
            model_fn, params, images.shape, k_loop, img=x_t0, num_steps=t0
        )

    manual = manual_fn(model.params, y, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(manual))


# ---- 2/3. strength semantics on the analytic field -------------------------------------
def test_strength_zero_is_near_identity():
    p = GaussianDiffusion(timesteps=T, schedule_name="linear")
    model = DDPM(cfg=_tiny_cfg(timesteps=T))
    model.init_params(jax.random.PRNGKey(0))
    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(2), (2, IMG, IMG, 1)), 0.1, 0.9)
    out = np.asarray(model.edit(y, strength=0.0, key=jax.random.PRNGKey(3)))
    # only the t=0 forward noise separates output from input:
    # |out - y| <= sqrt(1 - acp_0)/2 * |eps| in display space
    bound = 6.0 * float(np.sqrt(1.0 - np.asarray(p.constants.alphas_cumprod)[0])) / 2.0
    assert np.abs(out - np.asarray(y)).max() < max(bound, 0.05)


def test_strength_one_contracts_to_the_model_point_mass():
    model = DDPM(cfg=_tiny_cfg(timesteps=100))
    model.init_params(jax.random.PRNGKey(0))
    x0_star = 0.4
    field = _point_field(
        model.sampler, np.full((1, IMG, IMG, 1), x0_star, np.float32)
    )
    model.get_model_fn = lambda *a, **k: field  # analytic denoiser
    model._jit_cache = {}

    y = jnp.full((2, IMG, IMG, 1), 0.05, jnp.float32)  # display-space input != x0*
    out = np.asarray(model.edit(y, strength=1.0, key=jax.random.PRNGKey(4)))
    # display space: (x0* + 1)/2 = 0.7
    assert abs(out.mean() - 0.7) < 0.05
    assert out.std() < 0.1


# ---- 4. determinism + validation --------------------------------------------------------
def test_determinism_and_validation():
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (1, IMG, IMG, 1)), 0, 1)
    a = model.edit(y, strength=0.5, key=jax.random.PRNGKey(6))
    b = model.edit(y, strength=0.5, key=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError):
        model.edit(y, strength=1.5)
    with pytest.raises(ValueError):
        model.edit(y, strength=-0.1)

    from diffusion_model_nemo_tpu.modules.rectified_flow import RectifiedFlowProcess

    model.sampler = RectifiedFlowProcess(sample_steps=4)
    with pytest.raises(ValueError):
        model.edit(y, strength=0.5)


def test_ddim_configured_sampler_edits_on_the_ancestral_chain():
    """A DDIM-swapped archive still edits: GeneralizedGaussianDiffusion
    overrides p_sample_loop (strided chain, ignores num_steps) but keeps the
    ancestral machinery; edit must run the ancestral partial chain and match
    the vanilla sampler to fp tolerance (same constants and keys; DDIM's
    p_mean_variance computes x0 via the algebraically-identical extended-
    alpha form — (x − ε√(1−ᾱ))/√ᾱ vs x·√(1/ᾱ) − ε·√(1/ᾱ−1) — so bitwise
    equality is not expected, only numerical)."""
    plain_model = DDPM(cfg=_tiny_cfg())
    plain_model.init_params(jax.random.PRNGKey(0))

    ddim_cfg = _tiny_cfg()
    ddim_cfg["sampler"]["_target_"] = (
        "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
    )
    ddim_cfg["sampler"]["ddim_timesteps"] = 5
    ddim_model = DDPM(cfg=ddim_cfg)
    ddim_model.init_params(jax.random.PRNGKey(0))

    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(10), (2, IMG, IMG, 1)), 0, 1)
    key = jax.random.PRNGKey(12)
    a = np.asarray(plain_model.edit(y, strength=0.5, key=key))
    b = np.asarray(ddim_model.edit(y, strength=0.5, key=key))
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---- 5. model e2e -----------------------------------------------------------------------
def test_mesh_sharded_edit_matches():
    from diffusion_model_nemo_tpu.parallel import make_mesh

    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(8), (16, IMG, IMG, 1)), 0, 1)
    key = jax.random.PRNGKey(9)
    plain = model.edit(y, strength=0.7, key=key)
    assert plain.shape == (16, IMG, IMG, 1)
    assert np.isfinite(np.asarray(plain)).all()

    mesh = make_mesh(jax.devices()[:8])
    sharded = model.edit(y, strength=0.7, key=key, mesh=mesh)
    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
