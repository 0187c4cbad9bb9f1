"""Reflow / rectification (training/reflow.py; Liu et al. 2022 §3).

Correctness anchors:
  1. Closed-form zero: on the single-point analytic field, pair generation
     is exact (every z transports to x0*), and the analytic field is ALSO
     the exact minimizer of the reflow regression — v(x_t, t) = (x_t -
     x0*)/t = z - x0* on every pair path — so the fused
     generate-pairs-then-regress step must report loss ~0 at lr=0. This
     pins the coupling, the path point, and the target assembly end to end
     through the jitted step.
  2. Rectification effect on a real tiny net: reflow explicitly teaches
     v(z, 1) = z - ODE(z), so the 1-step Euler error against the teacher's
     full ODE must drop markedly from its pre-reflow value.
  3. Packaging: student_model persists a 1-step sampler config and archive
     round-trips.
  4. Mesh DP equals single device (under SGD — same rationale as the
     distiller mesh tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_model_nemo_tpu.training.reflow import ReflowTrainer

IMG = 8


def _tiny_cfg():
    return {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 8,
        "compute_bpd": False,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.RectifiedFlowProcess",
            "sample_steps": 8,
            "solver": "euler",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


class _AnalyticModel:
    """Stub exposing ReflowTrainer's surface with the exact single-point
    field v(x, t) = (x - x0*)/t (see tests/test_rectified_flow.py)."""

    def __init__(self, x0_star):
        from diffusion_model_nemo_tpu.modules import RectifiedFlowProcess

        self.sampler = RectifiedFlowProcess(sample_steps=6)
        self.image_size = IMG
        self.channels = 1
        self._x0s = jnp.asarray(x0_star, jnp.float32)
        self.params = {"w": jnp.zeros(())}
        self.cfg = _tiny_cfg()

    def get_model_fn(self, batch=None, training=False, key=None):
        x0s, scale = self._x0s, self.sampler.time_scale

        def fn(params, x, t_net):
            t = (t_net / scale).reshape((-1,) + (1,) * (x.ndim - 1))
            return (x - x0s) / jnp.maximum(t, 1e-6) + 0.0 * params["w"]

        return fn


def test_reflow_loss_zero_on_analytic_field():
    x0_star = np.full((1, IMG, IMG, 1), 0.3, np.float32)
    model = _AnalyticModel(x0_star)
    rt = ReflowTrainer(model, learning_rate=0.0)
    _, losses = rt.reflow(steps=2, batch_size=4, key=jax.random.PRNGKey(0), log_every=1)
    assert max(losses) < 1e-6, losses


def _one_step_error(model, params, z, pair_steps=8):
    """mean |1-step Euler from z - teacher full ODE from z| in data space."""
    fn = model.get_model_fn()
    full = model.sampler.p_sample_loop(
        fn, model.params, z.shape, jax.random.PRNGKey(0), img=z,
        num_steps=pair_steps, unnormalize=False,
    )
    one = model.sampler.p_sample_loop(
        fn, params, z.shape, jax.random.PRNGKey(0), img=z,
        num_steps=1, unnormalize=False,
    )
    return float(jnp.mean(jnp.abs(one - full)))


@pytest.mark.slow  # ~2-3 min: 300 pretrain + 150 reflow steps
def test_reflow_straightens_one_step_sampling():
    """The teacher is trained on BIMODAL data (all-dark / all-bright images):
    a bimodal target makes the optimal flow genuinely curved (velocity must
    depend on x and t), unlike noise-image training where the near-constant
    field is already straight and there is nothing to rectify. At this test
    scale the dim-8 net cannot fit the coupling regression to zero (the
    reflow loss plateaus ~0.016), which bounds the achievable improvement —
    measured ratios are 0.66-0.71 across seeds/steps — so the assertion is
    a margin below that, not the paper's asymptotic near-zero."""
    from diffusion_model_nemo_tpu.models import RectifiedFlow

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    tx = optax.adam(2e-3)
    params, opt = model.params, None
    opt = tx.init(params)

    @jax.jit
    def pre(params, opt, batch, key):
        (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
            params, batch, key, 0
        )
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, sub = jax.random.split(key)
        vals = rng.choice([51, 204], size=(16,))
        batch = {
            "image": np.broadcast_to(
                vals[:, None, None, None], (16, IMG, IMG, 1)
            ).astype(np.uint8).copy()
        }
        params, opt, _ = pre(params, opt, batch, sub)
    model.params = params

    z_eval = jnp.asarray(rng.standard_normal((16, IMG, IMG, 1)), jnp.float32)
    err_before = _one_step_error(model, model.params, z_eval)

    rt = ReflowTrainer(model, learning_rate=2e-3)
    student, losses = rt.reflow(
        steps=150, batch_size=16, key=jax.random.PRNGKey(2), log_every=50
    )
    assert np.isfinite(losses).all()
    err_after = _one_step_error(model, student, z_eval)
    assert err_after < 0.8 * err_before, (err_before, err_after)


def test_student_model_packaging(tmp_path):
    from diffusion_model_nemo_tpu.models import RectifiedFlow, restore_model_from_archive

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    rt = ReflowTrainer(model, learning_rate=1e-3)
    student_params, _ = rt.reflow(steps=2, batch_size=4, key=jax.random.PRNGKey(3), log_every=0)

    student = rt.student_model(student_params, sample_steps=1)
    assert student.sampler.sample_steps == 1
    path = student.save_to(str(tmp_path / "rf1.dmn"))
    loaded = restore_model_from_archive(path)
    assert type(loaded).__name__ == "RectifiedFlow"
    assert loaded.sampler.sample_steps == 1
    out = loaded.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(4))
    assert out.shape == (2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_mesh_dp_matches_single_device():
    """Reflow over the 8-way data mesh equals the single-device run (SGD —
    Adam/global-norm-clip are gradient-scale-invariant, see the distiller
    mesh tests for the full rationale)."""
    from diffusion_model_nemo_tpu.models import RectifiedFlow
    from diffusion_model_nemo_tpu.parallel.sharding import make_strategy_mesh

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))

    def run(mesh):
        rt = ReflowTrainer(model, mesh=mesh)
        rt._tx = optax.sgd(1e-3)
        return rt.reflow(steps=2, batch_size=8, key=jax.random.PRNGKey(5), log_every=1)

    p_single, l_single = run(None)
    mesh = make_strategy_mesh(jax.devices()[:8], "ddp")
    p_mesh, l_mesh = run(mesh)
    np.testing.assert_allclose(l_single, l_mesh, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        ),
        p_single,
        p_mesh,
    )
