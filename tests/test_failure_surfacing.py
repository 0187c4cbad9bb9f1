"""Failure paths must surface, not silently corrupt results (VERDICT r1 #7/#10).

- RK45 exhaustion NaN-poisons outputs instead of returning the last iterate
  as if converged (ProbabilityFlowSampler / LikelihoodEstimate).
- WaveGrad's periodic sample grids propagate back to the Trainer image hook.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_model_nemo_tpu.ops.ode import odeint_rk45, poison_on_failure


def test_rk45_success_on_easy_problem():
    sol = odeint_rk45(lambda t, y: -y, jnp.ones((4,)), 0.0, 1.0, max_steps=1000)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.y), np.exp(-1.0), rtol=1e-4)


def test_rk45_exhaustion_poisons_output():
    # 2 steps cannot integrate an oscillator over a long span at tight tol.
    f = lambda t, y: jnp.stack([y[1], -100.0 * y[0]])
    sol = odeint_rk45(f, jnp.array([1.0, 0.0]), 0.0, 100.0, rtol=1e-8, atol=1e-8, max_steps=2)
    assert not bool(sol.success)
    poisoned = poison_on_failure(sol, sol.y, "test")
    assert np.all(np.isnan(np.asarray(poisoned)))


def test_poison_preserves_int_leaves_and_success_passthrough():
    sol_ok = odeint_rk45(lambda t, y: -y, jnp.ones((2,)), 0.0, 0.5, max_steps=1000)
    tree = {"x": sol_ok.y, "count": jnp.asarray(3, jnp.int32)}
    out = poison_on_failure(sol_ok, tree, "test")
    assert np.all(np.isfinite(np.asarray(out["x"])))
    assert int(out["count"]) == 3


def test_wavegrad_save_image_step_returns_images(tmp_path):
    from tests.test_models_e2e import base_cfg, IMG

    cfg = base_cfg(
        tmp_path,
        sampler={
            "_target_": "diffusion_model_nemo.modules.WaveGradDiffusion",
            "timesteps": 20,
            "schedule_name": "linear",
            "schedule_cfg": {"linear": {"beta_start": 1e-6, "beta_end": 0.01}},
        },
        timesteps=20,
        save_every=1,
    )
    cfg.diffusion_model["_target_"] = "diffusion_model_nemo.modules.WaveGradUNet"
    cfg.diffusion_model["with_time_emb"] = False
    from diffusion_model_nemo_tpu.models import WavegradDDPM

    model = WavegradDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    imgs = model._save_image_step(batch_size=4, step=1, key=jax.random.PRNGKey(1))
    assert imgs is not None and imgs.shape[0] == 4  # Trainer logs these to TB
    # and the long training schedule was restored afterwards
    assert model.sampler.timesteps == 20
