"""Modern training knobs (beyond the reference's uniform-weight L_simple):
Min-SNR-γ loss weighting (Hang et al. 2023), zero-terminal-SNR schedule
rescale (Lin et al. 2024), and offset noise. All opt-in: with every knob
unset, the training step is bitwise the previous behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.modules import GaussianDiffusion
from diffusion_model_nemo_tpu.ops.schedules import (
    get_named_beta_schedule,
    rescale_zero_terminal_snr,
)


def _cfg(**model_overrides):
    d = {
        "image_size": 8,
        "timesteps": 10,
        "channels": 3,
        "save_every": 0,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 3,
            "use_convnext": False,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
        },
        "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
        "optim": {"name": "adamw", "lr": 1e-3},
    }
    d.update(model_overrides)
    return from_dict(d)


BATCH = {"image": np.random.RandomState(0).randint(0, 255, (4, 8, 8, 3), np.uint8)}


# ------------------------------------------------------- zero-terminal SNR ----
def test_rescale_zero_terminal_snr_properties():
    """Lin et al. 2024 Alg. 1: terminal ᾱ exactly 0, the FIRST √ᾱ preserved,
    interior SNRs strictly decreasing, betas valid."""
    betas = get_named_beta_schedule("linear", 1000, None)
    new = rescale_zero_terminal_snr(betas)

    ab_old = np.cumprod(1.0 - np.asarray(betas, np.float64))
    ab_new = np.cumprod(1.0 - new)
    assert ab_new[-1] == pytest.approx(0.0, abs=1e-12)
    assert np.sqrt(ab_new[0]) == pytest.approx(np.sqrt(ab_old[0]), rel=1e-10)
    assert np.all(np.diff(ab_new) < 0)
    assert np.all(new > 0) and np.all(new <= 1.0 + 1e-12)


def test_zero_terminal_snr_rejects_pred_noise():
    with pytest.raises(ValueError, match="unidentifiable"):
        GaussianDiffusion(
            timesteps=10, schedule_name="linear", zero_terminal_snr=True
        )


def test_zero_terminal_snr_pred_v_trains_and_samples(rng):
    """A ZTSNR pred_v model runs the full train step and both samplers with
    finite outputs (the 1/ᾱ inf constants never reach the pred_v formulas)."""
    cfg = _cfg()
    cfg["sampler"] = dict(cfg["sampler"])
    cfg["sampler"].update({"objective": "pred_v", "zero_terminal_snr": True})
    m = DDPM(cfg=from_dict(dict(cfg)))
    m.init_params(rng)
    assert float(m.sampler.constants.alphas_cumprod[-1]) == 0.0

    (loss, _), grads = jax.value_and_grad(m.training_step, has_aux=True)(
        m.params, BATCH, rng, 0
    )
    assert np.isfinite(float(loss))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))

    imgs = m.sample(batch_size=2, image_size=8, key=rng)
    assert bool(jnp.all(jnp.isfinite(imgs)))

    m.change_sampler(
        {
            "_target_": "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
            "objective": "pred_v",
            "zero_terminal_snr": True,
            "eta": 0.0,
            "ddim_timesteps": 5,
        }
    )
    imgs = m.sample(batch_size=2, image_size=8, key=rng)
    assert bool(jnp.all(jnp.isfinite(imgs)))


# ------------------------------------------------------------- Min-SNR-γ ----
@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_min_snr_weight_closed_form(objective):
    """min_snr_weight equals the hand-computed objective-aware formula."""
    p = GaussianDiffusion(timesteps=10, schedule_name="linear", objective=objective)
    gamma = 5.0
    t = jnp.arange(10, dtype=jnp.int32)
    w = np.asarray(p.min_snr_weight(t, gamma)).reshape(-1)

    ab = np.asarray(p.constants.alphas_cumprod, np.float64)
    snr = ab / (1.0 - ab)
    expected = np.minimum(snr, gamma)
    if objective == "pred_noise":
        expected = expected / snr
    elif objective == "pred_v":
        expected = expected / (snr + 1.0)
    np.testing.assert_allclose(w, expected, rtol=1e-5)


def test_snr_gamma_weighted_training_loss(rng):
    """With snr_gamma the training loss equals the manually weighted
    per-sample loss under the identical key stream; without it the step is
    bitwise the unweighted baseline."""
    base = DDPM(cfg=_cfg())
    base.init_params(rng)
    weighted = DDPM(cfg=_cfg(snr_gamma=5.0))
    weighted.params = base.params

    l0, _ = base.training_step(base.params, BATCH, rng, 0)
    l1, _ = weighted.training_step(base.params, BATCH, rng, 0)
    assert float(l0) != float(l1)

    # replay the step manually to pin the weighted value
    from diffusion_model_nemo_tpu.data.hf_vision_data import preprocess_batch

    k_pre, k_t, k_noise, k_drop = jax.random.split(rng, 4)
    proc = preprocess_batch(jax.tree.map(jnp.asarray, BATCH), k_pre, train=True)
    samples = proc["pixel_values"]
    t = jax.random.randint(k_t, (samples.shape[0],), 0, 10, dtype=jnp.int32)
    noise = jax.random.normal(k_noise, samples.shape, samples.dtype)
    x_t = base.sampler.q_sample(samples, t, noise)
    out = base.model_fn(base.params, x_t, t, dropout_rng=k_drop)
    per = ((out - noise) ** 2).reshape(samples.shape[0], -1).mean(-1)
    w = base.sampler.min_snr_weight(t, 5.0)
    np.testing.assert_allclose(float(l1), float((w * per).mean()), rtol=1e-6)
    np.testing.assert_allclose(float(l0), float(((out - noise) ** 2).mean()), rtol=1e-6)


# ------------------------------------------------------------ offset noise ----
def test_offset_noise_structure(rng):
    """offset_noise_strength=s adds an s·N(0,1) per-(example, channel)
    component constant over space; s=0 is bitwise the base draw."""
    m0 = DDPM(cfg=_cfg())
    ms = DDPM(cfg=_cfg(offset_noise_strength=0.5))
    samples = jnp.zeros((4, 8, 8, 3))

    base = m0._draw_noise(rng, samples)
    plain = jax.random.normal(rng, samples.shape, samples.dtype)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(plain))

    shifted = ms._draw_noise(rng, samples)
    delta = np.asarray(shifted - base)
    # constant over the spatial dims, distinct per example and channel
    # f32: (noise + s*off) - noise re-rounds per pixel — constant to ~1e-6
    np.testing.assert_allclose(delta, delta[:, :1, :1, :] * np.ones_like(delta), rtol=0, atol=1e-5)
    assert np.std(delta[:, 0, 0, :]) > 0.0


def test_offset_noise_training_step_changes_loss(rng):
    base = DDPM(cfg=_cfg())
    base.init_params(rng)
    off = DDPM(cfg=_cfg(offset_noise_strength=0.3))
    off.params = base.params
    l0, _ = base.training_step(base.params, BATCH, rng, 0)
    l1, _ = off.training_step(base.params, BATCH, rng, 0)
    assert float(l0) != float(l1)
    assert np.isfinite(float(l1))
