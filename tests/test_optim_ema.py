"""Optimizer/schedule builder and EMA update math."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_model_nemo_tpu.training.ema import ema_update, init_ema
from diffusion_model_nemo_tpu.training.optim import build_lr_schedule, build_optimizer


def test_cosine_annealing_endpoints():
    sched = build_lr_schedule({"lr": 1e-3, "sched": {"name": "CosineAnnealing", "min_lr": 1e-5}}, 100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)
    assert float(sched(50)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-2)


def test_warmup_steps_and_ratio():
    s1 = build_lr_schedule(
        {"lr": 1e-3, "sched": {"name": "CosineAnnealing", "warmup_steps": 10, "min_lr": 0.0}}, 100
    )
    assert float(s1(0)) == 0.0
    assert float(s1(5)) == pytest.approx(5e-4)
    assert float(s1(10)) == pytest.approx(1e-3)
    s2 = build_lr_schedule(
        {"lr": 1e-3, "sched": {"name": "CosineAnnealing", "warmup_ratio": 0.1, "min_lr": 0.0}}, 100
    )
    assert float(s2(5)) == pytest.approx(float(s1(5)))


def test_no_schedule_constant():
    sched = build_lr_schedule({"lr": 5e-4}, 100)
    assert float(sched(0)) == float(sched(99)) == pytest.approx(5e-4)


def test_build_optimizer_clips_gradients():
    tx, _ = build_optimizer({"name": "adamw", "lr": 1.0}, max_steps=10, grad_clip=1.0)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    huge = {"w": jnp.full(3, 1e6)}
    updates, _ = tx.update(huge, state, params)
    # adamw normalizes anyway; check clip alone:
    clip = optax.clip_by_global_norm(1.0)
    cupd, _ = clip.update(huge, clip.init(params), params)
    assert float(optax.global_norm(cupd)) == pytest.approx(1.0, rel=1e-5)


def test_ema_update_closed_form():
    ema = {"w": jnp.zeros(2)}
    params = {"w": jnp.ones(2)}
    # large step → ramp saturates at decay
    out = ema_update(ema, params, decay=0.9, step=jnp.asarray(10_000))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
    # step-0 warmup ramp: d = min(0.9, 1/10) = 0.1 → ema ≈ params quickly
    out0 = ema_update(ema, params, decay=0.9, step=jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out0["w"]), 0.9, rtol=1e-6)
    # no step: plain decay
    out_ns = ema_update(ema, params, decay=0.5)
    np.testing.assert_allclose(np.asarray(out_ns["w"]), 0.5, rtol=1e-6)


def test_init_ema_is_a_copy():
    params = {"w": jnp.ones(2)}
    ema = init_ema(params)
    assert ema["w"] is not params["w"]
    np.testing.assert_array_equal(np.asarray(ema["w"]), np.asarray(params["w"]))


def test_unknown_optimizer_and_schedule_raise():
    with pytest.raises(ValueError):
        build_optimizer({"name": "lion", "lr": 1e-3}, 10)
    with pytest.raises(ValueError):
        build_lr_schedule({"lr": 1e-3, "sched": {"name": "StepLR"}}, 10)
