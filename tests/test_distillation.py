"""Progressive distillation (training/distillation.py).

Correctness anchors:
  1. Closed-form target algebra: on an epsilon-field whose implied x0 is an
     exact constant image, DDIM is exact at every step count, so the
     two-teacher-step distillation target must equal that constant — and for
     the zero-image field the target must be exactly zero.
  2. predict_eps_x0 is the exact inverse of every parameterization.
  3. E2E: a tiny teacher distills 1000→(T/2) on synthetic data under jit;
     loss is finite and falls; the packaged student model samples at N steps
     through the stock DDIM scan, and its archive round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.training.distillation import (
    ProgressiveDistiller,
    predict_eps_x0,
)

T = 40
IMG = 8


def _tiny_cfg(objective="pred_noise", timesteps=T):
    return {
        "image_size": IMG,
        "channels": 1,
        "timesteps": timesteps,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": timesteps,
            "schedule_name": "cosine",
            "objective": objective,
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


def test_predict_eps_x0_inverts_all_objectives(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.uniform(k1, (4, IMG, IMG, 1), minval=-1, maxval=1)
    eps = jax.random.normal(k2, x0.shape)
    a = jax.random.uniform(k3, (4, 1, 1, 1), minval=0.05, maxval=0.95)
    alpha, sigma = jnp.sqrt(a), jnp.sqrt(1 - a)
    x = alpha * x0 + sigma * eps
    v = alpha * eps - sigma * x0
    for objective, out in (("pred_noise", eps), ("pred_x0", x0), ("pred_v", v)):
        e_, x0_ = predict_eps_x0(objective, out, x, alpha, sigma)
        np.testing.assert_allclose(np.asarray(e_), np.asarray(eps), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x0_), np.asarray(x0), atol=1e-5)


class _AnalyticModel:
    """Stub model exposing the surface ProgressiveDistiller needs, with an
    analytic 'network': eps(x, t) consistent with a constant x0*."""

    def __init__(self, x0_star, timesteps=T, objective="pred_noise"):
        from diffusion_model_nemo_tpu.modules import GaussianDiffusion

        self.timesteps = timesteps
        self.sampler = GaussianDiffusion(
            timesteps=timesteps, schedule_name="cosine", objective=objective
        )
        self._x0_star = jnp.asarray(x0_star, jnp.float32)
        self.params = {"w": jnp.zeros(())}  # nonempty pytree for the optimizer

    def get_model_fn(self, batch=None, training=False, key=None):
        acp = self.sampler.constants.alphas_cumprod
        x0s = self._x0_star

        def fn(params, x, t):
            a = jnp.take(acp, t.astype(jnp.int32)).reshape((-1,) + (1,) * (x.ndim - 1))
            return (x - jnp.sqrt(a) * x0s) / jnp.sqrt(1.0 - a) + 0.0 * params["w"]

        return fn


@pytest.mark.parametrize("x0_const", [0.0, 0.37])
def test_distill_target_is_exact_on_constant_field(x0_const):
    """On the constant-x0 epsilon-field the 2-step teacher composition is
    exact, so the distillation loss of a student that ALSO predicts that
    field must be ~0 already at init — i.e. target == student prediction ==
    x0*. We check it end-to-end: one distill step's loss on such a
    self-consistent pair is ~0 (vs ~O(1) on a wrong student)."""
    x0_star = np.full((1, IMG, IMG, 1), x0_const, np.float32)
    model = _AnalyticModel(x0_star)
    dist = ProgressiveDistiller(model, student_objective="pred_noise", learning_rate=0.0)
    step_fn = dist._get_step(stride=T // (T // 2), teacher_objective="pred_noise", substeps=2)

    batch = {"image": jnp.asarray(np.full((4, IMG, IMG, 1), 128, np.uint8))}
    params = model.params
    opt_state = dist._tx.init(params)
    _, _, loss = step_fn(
        jax.tree.map(jnp.copy, params), opt_state, params, batch, jax.random.PRNGKey(0)
    )
    # teacher == student == exact field → weighted x0-error is numerically 0
    assert float(loss) < 1e-6


def test_distill_phase_validates_grid():
    model = _AnalyticModel(np.zeros((1, IMG, IMG, 1), np.float32))
    dist = ProgressiveDistiller(model, student_objective="pred_noise")
    with pytest.raises(ValueError, match="divide"):
        dist.distill_phase(model.params, "pred_noise", 7, iter([]), 1, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="even"):
        # stride T/(T) = 1 → odd
        dist.distill_phase(model.params, "pred_noise", T, iter([]), 1, jax.random.PRNGKey(0))


def _synthetic_batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {"image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)}


@pytest.mark.slow
def test_distill_e2e_tiny_unet(tmp_path):
    """Full recipe on a real (random-init) tiny U-Net: objective transfer
    (eps → v) then one halving phase; student samples at T/2 DDIM steps and
    the archive round-trips with the distilled sampler config."""
    model = DDPM(cfg=_tiny_cfg("pred_noise"))
    model.init_params(jax.random.PRNGKey(0))
    model.ema_params = jax.tree.map(jnp.copy, model.params)

    dist = ProgressiveDistiller(model, student_objective="pred_v", learning_rate=1e-3)
    batches = _synthetic_batches()
    params, history = dist.distill(
        batches,
        final_steps=T // 2,
        steps_per_phase=6,
        key=jax.random.PRNGKey(1),
        transfer_steps=6,
        log_every=0,
    )
    assert "transfer" in history and f"N={T // 2}" in history
    flat = jax.tree.leaves(params)
    assert all(np.all(np.isfinite(np.asarray(p))) for p in flat)

    student = dist.student_model(params, student_steps=T // 2)
    assert student.sampler.objective == "pred_v"
    assert student.sampler.ddim_timesteps == T // 2
    out = student.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert out.shape == (2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    # archive round-trip preserves the distilled sampler config
    path = str(tmp_path / "student.dmn")
    student.save_to(path)
    restored = DDPM.restore_from(path)
    assert restored.sampler.objective == "pred_v"
    assert restored.sampler.ddim_timesteps == T // 2


def test_transfer_loss_decreases():
    """With a FIXED batch and key the transfer step is a deterministic
    full-batch regression — Adam must drive its loss way down."""
    model = DDPM(cfg=_tiny_cfg("pred_noise", timesteps=10))
    model.init_params(jax.random.PRNGKey(0))
    dist = ProgressiveDistiller(model, student_objective="pred_v", learning_rate=3e-3)
    step_fn = dist._get_step(stride=1, teacher_objective="pred_noise", substeps=1)

    batch = next(_synthetic_batches())
    key = jax.random.PRNGKey(1)
    params = jax.tree.map(jnp.copy, model.params)
    opt_state = dist._tx.init(params)
    losses = []
    for _ in range(60):
        params, opt_state, loss = step_fn(params, opt_state, model.params, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])


def _conditional_cfg(num_classes=4):
    cfg = _tiny_cfg("pred_noise", timesteps=8)
    cfg["num_classes"] = num_classes
    cfg["diffusion_model"]["num_classes"] = num_classes
    cfg["sampler"]["class_conditional"] = True
    return cfg


def _labeled_batches(batch_size=8, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8),
            "label": rng.integers(0, num_classes, (batch_size,), dtype=np.int64),
        }


def test_guidance_scale_requires_conditional_teacher():
    model = DDPM(cfg=_tiny_cfg("pred_noise"))
    with pytest.raises(ValueError, match="class-conditional"):
        ProgressiveDistiller(model, guidance_scale=2.0)


def test_guidance_scale_rejects_text_teacher(tmp_path):
    """TextConditionalDDPM also defines _cfg_model_fn but with a
    (tokens, null, w) signature; guided distillation must reject it loudly
    instead of TypeError-ing inside the jitted step (ADVICE r3)."""
    from test_text_conditional import tiny_text_cfg

    from diffusion_model_nemo_tpu.models import TextConditionalDDPM

    model = TextConditionalDDPM(cfg=tiny_text_cfg(tmp_path))
    with pytest.raises(ValueError, match="text-conditional"):
        ProgressiveDistiller(model, guidance_scale=2.0)


@pytest.mark.slow  # 71 s: guided + plain distill steps on a conditional teacher
def test_guided_distill_w1_matches_conditional():
    """w=1 CFG reduces to plain conditional (up to 2B-batch fp rounding), so
    the w=1 guided distill step must produce the unguided step's loss."""
    from diffusion_model_nemo_tpu.models import ConditionalDDPM

    model = ConditionalDDPM(cfg=_conditional_cfg())
    model.init_params(jax.random.PRNGKey(0))
    batch = next(_labeled_batches())
    key = jax.random.PRNGKey(3)

    losses = {}
    for name, w in (("plain", None), ("w1", 1.0)):
        dist = ProgressiveDistiller(
            model, student_objective="pred_noise", learning_rate=0.0, guidance_scale=w
        )
        step_fn = dist._get_step(
            stride=2, teacher_objective="pred_noise", substeps=2, guided=w is not None
        )
        params = jax.tree.map(jnp.copy, model.params)
        opt_state = dist._tx.init(params)
        _, _, loss = step_fn(params, opt_state, model.params, batch, key)
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["w1"], losses["plain"], rtol=1e-4)


@pytest.mark.slow
def test_guided_distill_e2e():
    """Guided (w=2) distillation runs the full recipe on a conditional
    teacher; the student samples class-conditionally WITHOUT guidance (the
    w is absorbed) and differs from the unguided student."""
    from diffusion_model_nemo_tpu.models import ConditionalDDPM

    model = ConditionalDDPM(cfg=_conditional_cfg())
    model.init_params(jax.random.PRNGKey(0))
    model.ema_params = jax.tree.map(jnp.copy, model.params)

    dist = ProgressiveDistiller(
        model, student_objective="pred_v", learning_rate=1e-3, guidance_scale=2.0
    )
    params, history = dist.distill(
        _labeled_batches(),
        final_steps=4,
        steps_per_phase=4,
        key=jax.random.PRNGKey(1),
        transfer_steps=4,
        log_every=0,
    )
    assert all(np.all(np.isfinite(np.asarray(p))) for p in jax.tree.leaves(params))
    student = dist.student_model(params, student_steps=4)
    out = student.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2), label=1)
    assert out.shape == (2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # 162 s: three-stage guided distillation recipe, many step compiles
def test_guidance_absorbed_exactly_once(monkeypatch):
    """Only the FIRST stage of the recipe may wrap the teacher in the CFG
    combination — later teachers are students that already absorbed w, and
    re-wrapping compounds guidance to w^2. Spy on the step builder."""
    from diffusion_model_nemo_tpu.models import ConditionalDDPM

    model = ConditionalDDPM(cfg=_conditional_cfg())
    model.init_params(jax.random.PRNGKey(0))
    dist = ProgressiveDistiller(
        model, student_objective="pred_v", learning_rate=1e-3, guidance_scale=2.0
    )
    seen = []
    orig = ProgressiveDistiller._get_step

    def spy(self, stride, teacher_objective, substeps, guided=False):
        seen.append(guided)
        return orig(self, stride, teacher_objective, substeps, guided)

    monkeypatch.setattr(ProgressiveDistiller, "_get_step", spy)
    dist.distill(
        _labeled_batches(),
        final_steps=2,  # T=8 -> phases N=4, N=2
        steps_per_phase=1,
        key=jax.random.PRNGKey(1),
        transfer_steps=1,
        log_every=0,
    )
    assert seen == [True, False, False], seen


def test_mesh_dp_matches_single_device():
    """Progressive distillation over the 8-way data mesh: one halving phase's
    losses and student equal the single-device run.

    The optimizer is swapped for plain SGD: Adam's m/sqrt(v) (and global-norm
    clipping) are invariant to gradient SCALE, so a psum-vs-pmean bug would be
    invisible under the production tx — and Adam's early steps are ~sign(g)*lr,
    which amplifies 1e-7 reduction-order noise on near-zero grads into 2*lr
    param deltas. SGD is linear, so the mesh run must match tightly AND a
    wrong-by-8x gradient reduction shifts params by ~8x the update (caught)."""
    import optax

    from diffusion_model_nemo_tpu.parallel.sharding import make_strategy_mesh

    model = DDPM(cfg=_tiny_cfg("pred_noise", timesteps=16))
    model.init_params(jax.random.PRNGKey(0))

    def run(mesh):
        dist = ProgressiveDistiller(
            model, student_objective="pred_noise", mesh=mesh
        )
        dist._tx = optax.sgd(1e-3)
        return dist.distill_phase(
            model.params, "pred_noise", 8, _synthetic_batches(batch_size=8),
            steps=2, key=jax.random.PRNGKey(3), log_every=1,
        )

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
