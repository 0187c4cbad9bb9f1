"""Consistency distillation (training/consistency.py +
modules/consistency_sampler.py; Song et al. 2023).

Correctness anchors:
  1. Head boundary: f(x^, sigma_min) == x^ exactly by construction.
  2. Teacher Heun step: on the constant-x0 epsilon-field the ODE is linear
     and both Euler and Heun are exact — the step must land on the closed
     form x0* + (x^ - x0*) * sigma_lo/sigma_hi at per-sample random levels.
  3. EMA target update: mu=0 ties target to student; mu=1 freezes it.
  4. E2E (slow): tiny real teacher distills under jit (loss finite), the
     packaged 1-step/2-step students sample through the stock model surface,
     and the archive round-trips with the consistency sampler config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.modules import ConsistencySampler
from diffusion_model_nemo_tpu.training.consistency import ConsistencyDistiller

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


class _ConstantFieldModel:
    """Stub exposing the distiller's surface with an analytic network: the
    epsilon-field of a constant data point x0* (exact for any ODE step)."""

    def __init__(self, x0_star, timesteps=T):
        from diffusion_model_nemo_tpu.modules import GaussianDiffusion

        self.timesteps = timesteps
        self.sampler = GaussianDiffusion(
            timesteps=timesteps, schedule_name="cosine", objective="pred_noise"
        )
        self.cfg = {"sampler": {"schedule_name": "cosine"}}
        self._x0_star = jnp.asarray(x0_star, jnp.float32)
        self.params = {"w": jnp.zeros(())}

        acp = np.asarray(self.sampler.constants.alphas_cumprod, np.float64)
        self._lam = jnp.asarray(0.5 * (np.log1p(-acp) - np.log(acp)), jnp.float32)

    def get_model_fn(self, batch=None, training=False, key=None):
        lam, x0s, Tn = self._lam, self._x0_star, self.timesteps

        def fn(params, x, t):
            ts = jnp.arange(Tn, dtype=jnp.float32)
            sig = jnp.exp(jnp.interp(t.astype(jnp.float32), ts, lam))
            sig = sig.reshape((-1,) + (1,) * (x.ndim - 1))
            xhat = x * jnp.sqrt(1.0 + sig * sig)
            return (xhat - x0s) / sig + 0.0 * params["w"]

        return fn


def test_head_boundary_is_identity():
    cs = ConsistencySampler(
        timesteps=T, schedule_name="cosine", sample_steps=1, clip_denoised=False
    )
    smin = cs._sigma_floor()
    _, t_cond = cs._sigma_grid()
    x = jax.random.normal(jax.random.PRNGKey(0), (3, IMG * IMG))

    def net(params, xi, t):  # arbitrary nonzero net
        return xi * 2.0 + 1.0

    # c_out(sigma_min) == 0 → the net's output cannot matter
    f = cs.consistency_fn(net, None, x, smin, float(t_cond[-2]))
    np.testing.assert_array_equal(np.asarray(f), np.asarray(x))


def test_teacher_heun_step_exact_on_constant_field():
    x0_star = np.full((1, IMG, IMG, 1), 0.3, np.float32)
    model = _ConstantFieldModel(x0_star)
    dist = ConsistencyDistiller(model, grid_steps=8, learning_rate=0.0)
    sig_tab, t_tab = dist._grid_tables()

    B = 6
    rng = np.random.default_rng(0)
    n = rng.integers(0, len(sig_tab) - 1, (B,))
    sig_hi = jnp.asarray(sig_tab[n], jnp.float32)
    sig_lo = jnp.asarray(sig_tab[n + 1], jnp.float32)
    t_hi = jnp.asarray(t_tab[n], jnp.float32)
    t_lo = jnp.asarray(t_tab[n + 1], jnp.float32)

    xhat_hi = jnp.asarray(rng.normal(size=(B, IMG, IMG, 1)), jnp.float32) * sig_hi.reshape(
        -1, 1, 1, 1
    ) + jnp.asarray(x0_star)
    teacher_fn = model.get_model_fn(training=False)
    out = dist.teacher_heun_step(
        teacher_fn, model.params, xhat_hi, sig_hi, t_hi, sig_lo, t_lo
    )
    ratio = (sig_lo / sig_hi).reshape(-1, 1, 1, 1)
    exact = x0_star + (np.asarray(xhat_hi) - x0_star) * np.asarray(ratio)
    np.testing.assert_allclose(np.asarray(out), exact, atol=2e-4)

    # Euler is exact on this field too
    dist1 = ConsistencyDistiller(model, grid_steps=8, teacher_order=1)
    out1 = dist1.teacher_heun_step(
        teacher_fn, model.params, xhat_hi, sig_hi, t_hi, sig_lo, t_lo
    )
    np.testing.assert_allclose(np.asarray(out1), exact, atol=2e-4)


def _synthetic_batches(batch_size=4, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {"image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)}


@pytest.mark.parametrize(
    "mu",
    [0.0, pytest.param(1.0, marks=pytest.mark.slow)],  # 20+17 s warm; one param keeps the quick loop
)
def test_ema_target_update(mu):
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    dist = ConsistencyDistiller(model, grid_steps=4, ema_decay=mu, learning_rate=1e-3)
    step = dist._build_step()
    teacher = model.params
    student = jax.tree.map(jnp.copy, teacher)
    target = jax.tree.map(jnp.copy, teacher)
    opt = dist._tx.init(student)
    batch = next(_synthetic_batches())
    student2, target2, _, loss = step(
        student, target, opt, teacher, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    if mu == 0.0:  # target follows the student exactly
        chex_equal = jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            target2,
            student2,
        )
        del chex_equal
    else:  # mu == 1: target frozen at the teacher init
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            target2,
            teacher,
        )


@pytest.mark.slow
def test_consistency_e2e_tiny_unet(tmp_path):
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    dist = ConsistencyDistiller(
        model, grid_steps=6, ema_decay=0.9, learning_rate=1e-3, loss="pseudo_huber"
    )
    params, losses = dist.distill(
        _synthetic_batches(), steps=6, key=jax.random.PRNGKey(2), log_every=2
    )
    assert losses and all(np.isfinite(losses))

    # 1-step and multi-step students sample through the stock surface
    for k in (1, 2):
        student = dist.student_model(params, sample_steps=k)
        out = student.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(3))
        assert out.shape == (2, IMG, IMG, 1)
        assert np.all(np.isfinite(np.asarray(out)))

    # archive round trip preserves the consistency sampler config and output
    student = dist.student_model(params, sample_steps=2)
    ref = np.asarray(
        student.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(5))
    )
    path = str(tmp_path / "student_cd.dmn")
    student.save_to(path)
    restored = DDPM.restore_from(path)
    assert isinstance(restored.sampler, ConsistencySampler)
    assert restored.sampler.sample_steps == 2
    got = np.asarray(
        restored.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(5))
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.slow  # 29 s warm: CT-mode train program on the analytic field
def test_ct_mode_closed_form_loss():
    """CT (mode=train): with grid_steps=2 the only transition is
    sigma_max -> sigma_min, where the target head is the identity
    (f(x, sigma_min) == x), so the step's loss is computable in closed form:
    mean((f_theta(x0 + smax z, smax) - (x0 + smin z))^2)."""
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    dist = ConsistencyDistiller(
        model, grid_steps=2, ema_decay=1.0, learning_rate=0.0, mode="train"
    )
    step = dist._build_step()
    teacher = model.params
    student = jax.tree.map(jnp.copy, teacher)
    target = jax.tree.map(jnp.copy, teacher)
    opt = dist._tx.init(student)
    batch = next(_synthetic_batches())
    key = jax.random.PRNGKey(7)
    _, _, _, loss = step(student, target, opt, teacher, batch, key)

    # replay the step's internal randomness (same split order)
    from diffusion_model_nemo_tpu.data.hf_vision_data import preprocess_batch

    k_pre, k_n, k_z = jax.random.split(key, 3)
    proc = preprocess_batch(batch, k_pre, train=True)
    x0 = proc["pixel_values"]
    z = jax.random.normal(k_z, x0.shape, x0.dtype)  # n is always 0
    sig_tab, t_tab = dist._grid_tables()
    smax, smin = float(sig_tab[0]), float(sig_tab[1])
    head = dist._head
    f_stu = head.consistency_fn(
        model.get_model_fn(proc, training=False),
        model.params,
        x0 + smax * z,
        smax,
        float(t_tab[0]),
    )
    manual = float(jnp.mean((f_stu - (x0 + smin * z)) ** 2))
    np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


def test_ct_mode_needs_no_teacher_field():
    """CT never evaluates the teacher ODE step: a loss-poisoning teacher
    objective mismatch cannot affect it (the same config in distill mode
    does call the teacher)."""
    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    ct = ConsistencyDistiller(model, grid_steps=4, mode="train", ema_decay=0.5)
    params, losses = ct.distill(
        _synthetic_batches(), steps=3, key=jax.random.PRNGKey(1), log_every=1
    )
    assert losses and all(np.isfinite(losses))
    student = ct.student_model(params, sample_steps=1)
    out = student.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert out.shape == (2, IMG, IMG, 1)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # 117 s: mesh + single-device consistency distillation, SGD legs
def test_mesh_dp_matches_single_device():
    """CD over the 8-way data mesh: losses and the final student equal the
    single-device run (params replicated, batch sharded, SPMD reductions).

    The optimizer is swapped for plain SGD: Adam's m/sqrt(v) (and global-norm
    clipping) are invariant to gradient SCALE, so a psum-vs-pmean bug would be
    invisible under the production tx — and Adam's early steps are ~sign(g)*lr,
    which amplifies 1e-7 reduction-order noise on near-zero grads into 2*lr
    param deltas. SGD is linear, so the mesh run must match tightly AND a
    wrong-by-8x gradient reduction shifts params by ~8x the update (caught)."""
    import optax

    from diffusion_model_nemo_tpu.parallel.sharding import make_strategy_mesh

    model = DDPM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    kwargs = dict(grid_steps=4, ema_decay=0.9)

    def run(mesh):
        dist = ConsistencyDistiller(model, mesh=mesh, **kwargs)
        dist._tx = optax.sgd(1e-3)
        return dist.distill(
            _synthetic_batches(batch_size=8), steps=2,
            key=jax.random.PRNGKey(3), log_every=1,
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
