"""Rectified flow / flow matching (modules/rectified_flow.py,
models/rectified_flow.py).

Correctness anchors:
  1. Path algebra: q_sample endpoints (t=0 -> x0, t=1 -> eps) and the
     velocity target.
  2. Single-point analytic field v(x, t) = (x - x0*)/t: the trajectory is a
     straight line, so Euler is EXACT for any grid size (1 step included)
     and Heun (final-Euler boundary) matches it.
  3. Constant field v = c: encode is the exact inverse of decode on any grid.
  4. Solver convergence orders on a t-dependent field: Euler ~1st, Heun ~2nd.
  5. Time-sampling distributions stay in [0, 1].
  6. Model e2e: jitted training_step decreases the loss, sampling has
     the right shape/range, the archive round-trips (incl. the generic
     restore_model_from_archive dispatch), mesh-sharded sampling matches
     unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import RectifiedFlowProcess

IMG = 8


def _tiny_cfg(**over):
    cfg = {
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
            "time_scale": 1000.0,
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }
    cfg["sampler"].update(over)
    return cfg


def _analytic_field(x0_star, time_scale=1000.0):
    """model_fn for the single-data-point flow: v(x, t) = (x - x0*)/t.

    (x_t = (1-t) x0* + t eps  =>  eps = (x_t - (1-t) x0*)/t and
    v = eps - x0* = (x_t - x0*)/t.) Guarded at t=0 where the exact
    trajectory gives 0/0 (the limit is the constant slope; returning 0
    there is only reached by Heun's final evaluation, which the
    final-Euler boundary removes)."""
    x0s = jnp.asarray(x0_star, jnp.float32)

    def fn(params, x, t_net):
        t = (t_net / time_scale).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0s) / jnp.maximum(t, 1e-6)

    return fn


# ---- 1. path algebra ---------------------------------------------------------------
def test_path_endpoints_and_target():
    p = RectifiedFlowProcess(sample_steps=4)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, IMG, IMG, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(3, IMG, IMG, 1)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(p.q_sample(x0, jnp.zeros((3,)), eps)), np.asarray(x0), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(p.q_sample(x0, jnp.ones((3,)), eps)), np.asarray(eps), atol=1e-7
    )
    # mid-path point + target
    mid = p.q_sample(x0, jnp.full((3,), 0.25), eps)
    np.testing.assert_allclose(
        np.asarray(mid), np.asarray(0.75 * x0 + 0.25 * eps), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p.v_target(x0, eps)), np.asarray(eps - x0))
    # scalar t fast path
    np.testing.assert_allclose(
        np.asarray(p.q_sample(x0, jnp.asarray(0.25), eps)), np.asarray(mid), atol=1e-7
    )


# ---- 2. exactness on the straight-line field ---------------------------------------
@pytest.mark.parametrize("solver,steps", [("euler", 1), ("euler", 7), ("heun", 1), ("heun", 5)])
def test_exact_on_single_point_field(solver, steps):
    x0_star = np.full((1, IMG, IMG, 1), 0.3, np.float32)
    p = RectifiedFlowProcess(sample_steps=steps, solver=solver)
    fn = _analytic_field(x0_star)
    key = jax.random.PRNGKey(1)
    out = p.p_sample_loop(fn, None, (4, IMG, IMG, 1), key, unnormalize=False)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(x0_star, (4, IMG, IMG, 1)), atol=1e-4
    )


def test_frames_end_at_sample():
    x0_star = np.full((1, IMG, IMG, 1), -0.2, np.float32)
    p = RectifiedFlowProcess(sample_steps=5, solver="heun")
    fn = _analytic_field(x0_star)
    out, frames = p.p_sample_loop(
        fn, None, (2, IMG, IMG, 1), jax.random.PRNGKey(0), return_frames=True
    )
    assert frames.shape == (5, 2, IMG, IMG, 1)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(out), atol=1e-6)


# ---- 3. encode/decode inversion ------------------------------------------------------
def test_encode_inverts_decode_on_constant_field():
    c = 0.37

    def fn(params, x, t_net):
        return jnp.full_like(x, c)

    p = RectifiedFlowProcess(sample_steps=6)
    z = jax.random.normal(jax.random.PRNGKey(2), (3, IMG, IMG, 1))
    x0 = p.p_sample_loop(fn, None, z.shape, jax.random.PRNGKey(0), img=z, unnormalize=False)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(z - c), atol=1e-6)
    z_back = p.encode(fn, None, x0)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=1e-6)


# ---- 4. convergence orders ----------------------------------------------------------
def _ode_error(solver, steps):
    """Field v(x, t) = 3 t^2 (x-independent): exact displacement 1->0 is -1."""

    def fn(params, x, t_net):
        t = (t_net / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.broadcast_to(3.0 * t * t, x.shape)

    p = RectifiedFlowProcess(sample_steps=steps, solver=solver)
    z = jnp.zeros((1, IMG, IMG, 1))
    out = p.p_sample_loop(fn, None, z.shape, jax.random.PRNGKey(0), img=z, unnormalize=False)
    return abs(float(out[0, 0, 0, 0]) - (-1.0))


def test_solver_convergence_orders():
    e_euler = [_ode_error("euler", m) for m in (8, 16, 32)]
    e_heun = [_ode_error("heun", m) for m in (8, 16, 32)]
    for a, b in zip(e_euler[:-1], e_euler[1:]):
        assert 1.6 < a / b < 2.4, (a, b)  # 1st order
    for a, b in zip(e_heun[:-1], e_heun[1:]):
        assert a / b > 3.0, (a, b)  # ~2nd order (final-Euler boundary term)
    assert e_heun[0] < e_euler[0] / 5


# ---- 5. time sampling ----------------------------------------------------------------
@pytest.mark.parametrize("mode", ["uniform", "logit_normal"])
def test_time_sampling_in_range(mode):
    p = RectifiedFlowProcess(sample_steps=4, time_sampling=mode)
    t = np.asarray(p.sample_times(jax.random.PRNGKey(0), 512))
    assert t.shape == (512,)
    assert np.all(t >= 0.0) and np.all(t <= 1.0)
    assert 0.3 < float(t.mean()) < 0.7


def test_invalid_args_raise():
    with pytest.raises(ValueError):
        RectifiedFlowProcess(solver="rk45")
    with pytest.raises(ValueError):
        RectifiedFlowProcess(time_sampling="cosine")
    with pytest.raises(ValueError):
        RectifiedFlowProcess(sample_steps=0)


# ---- 6. model e2e ---------------------------------------------------------------------
def _batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {"image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)}


def test_model_training_decreases_loss_and_samples():
    from diffusion_model_nemo_tpu.models import RectifiedFlow

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))

    import optax

    tx = optax.adam(1e-3)
    params = model.params
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
            params, batch, key, 0
        )
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    batches = _batches()
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, next(batches), sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    model.params = params
    out = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert out.shape == (2, IMG, IMG, 1)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))

    # num_steps override + heun CLI path
    out5 = model.sample(
        batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2), num_steps=5
    )
    assert out5.shape == (2, IMG, IMG, 1)

    # interpolate through the latent
    x = jnp.asarray(out, jnp.float32)
    mix = model.interpolate(x, x[::-1], lambd=0.5)
    assert mix.shape == x.shape
    assert np.all(np.isfinite(np.asarray(mix)))

    # bits/dim = the EXACT change-of-variables NLL (not a discrete VLB)
    bpd_dict = model.calculate_bits_per_dimension(x * 2.0 - 1.0)
    assert bpd_dict["total_bpd"].shape == (x.shape[0],)
    assert np.isfinite(np.asarray(bpd_dict["total_bpd"])).all()


def test_archive_round_trip(tmp_path):
    from diffusion_model_nemo_tpu.models import RectifiedFlow, restore_model_from_archive

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    path = model.save_to(str(tmp_path / "rf.dmn"))

    loaded = restore_model_from_archive(path)
    assert type(loaded).__name__ == "RectifiedFlow"
    assert loaded.sampler.sample_steps == model.sampler.sample_steps

    key = jax.random.PRNGKey(3)
    a = model.sample(batch_size=2, image_size=IMG, key=key)
    b = loaded.sample(batch_size=2, image_size=IMG, key=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_sharded_sampling_matches():
    from diffusion_model_nemo_tpu.models import RectifiedFlow
    from diffusion_model_nemo_tpu.parallel import make_mesh

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(4)
    plain = model.sample(batch_size=16, image_size=IMG, key=key)

    mesh = make_mesh(jax.devices()[:8])
    sharded = model.sample(batch_size=16, image_size=IMG, key=key, mesh=mesh)
    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_test_step_aggregation():
    from diffusion_model_nemo_tpu.models import RectifiedFlow

    model = RectifiedFlow(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    batch = next(_batches())
    out = model.test_step(batch, 0)
    assert int(out["num_samples"]) == 8
    assert "bpds" in out  # exact NLL on by default
    agg = model.test_epoch_end([out, out])
    assert np.isfinite(agg["test_fm_loss"])
    assert np.isfinite(agg["test_total_bpd"])
    assert agg["avg_num_forward_evaluations"] == 8  # euler grid, M = 8

    # opt-out path
    cfg = _tiny_cfg()
    model2 = RectifiedFlow(cfg={**cfg, "compute_nll": False})
    model2.init_params(jax.random.PRNGKey(0))
    out2 = model2.test_step(batch, 0)
    assert "bpds" not in out2
    agg2 = model2.test_epoch_end([out2])
    assert "test_total_bpd" not in agg2


# ---- 7. exact likelihood (change-of-variables NLL) -----------------------------------
def test_likelihood_zero_field_is_prior():
    """v = 0: z == x and bpd = -log N(x; 0, I)/(D ln 2) + 7 exactly."""

    def fn(params, x, t_net):
        return jnp.zeros_like(x)

    p = RectifiedFlowProcess(sample_steps=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, IMG, IMG, 1)) * 0.5
    bpd, z, nfe = p.likelihood(fn, None, x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)
    D = IMG * IMG
    x_np = np.asarray(x).reshape(3, -1)
    prior = -0.5 * ((x_np**2).sum(1) + D * np.log(2 * np.pi))
    expect = -prior / np.log(2) / D + 7.0
    np.testing.assert_allclose(np.asarray(bpd), expect, rtol=1e-5)
    assert float(nfe) == 4


def test_likelihood_linear_field_closed_form():
    """v = a x: z = x e^a, logdet = a D; rademacher probes are per-probe
    exact for the diagonal Jacobian. Heun is 2nd-order on the exponential —
    tolerance covers its truncation at M = 64."""
    a = 0.3

    def fn(params, x, t_net):
        return a * x

    p = RectifiedFlowProcess(sample_steps=64, solver="heun")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, IMG, IMG, 1)) * 0.3
    bpd, z, nfe = p.likelihood(fn, None, x, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(z), np.asarray(x) * np.exp(a), rtol=1e-4)
    D = IMG * IMG
    z_np = np.asarray(x).reshape(2, -1) * np.exp(a)
    prior = -0.5 * ((z_np**2).sum(1) + D * np.log(2 * np.pi))
    logp0 = prior + a * D
    expect = -logp0 / np.log(2) / D + 7.0
    np.testing.assert_allclose(np.asarray(bpd), expect, rtol=1e-4)
    assert float(nfe) == 128


def test_likelihood_matches_analytic_gaussian_nll():
    """End-to-end: the analytic marginal velocity field of data ~ N(0, s^2 I)
    must assign exactly the N(0, s^2) NLL to any point."""
    s = 0.6
    s2 = s * s

    def fn(params, x, t_net):
        t = (t_net / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        # v(x, t) = E[eps - x0 | x_t] = (t - (1-t) s^2) / ((1-t)^2 s^2 + t^2) * x
        denom = (1.0 - t) ** 2 * s2 + t * t
        return (t - (1.0 - t) * s2) / denom * x

    p = RectifiedFlowProcess(sample_steps=128, solver="heun")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, IMG, IMG, 1)) * s
    bpd, _z, _ = p.likelihood(fn, None, x, jax.random.PRNGKey(5))
    D = IMG * IMG
    x_np = np.asarray(x).reshape(2, -1)
    logp = -0.5 * ((x_np**2).sum(1) / s2 + D * np.log(2 * np.pi * s2))
    expect = -logp / np.log(2) / D + 7.0
    np.testing.assert_allclose(np.asarray(bpd), expect, rtol=2e-3)


def test_likelihood_hutchinson_gaussian_unbiased():
    """Gaussian probes: noisy per-probe but the mean over probes converges to
    the rademacher (exact, diagonal J) value."""
    a = -0.2

    def fn(params, x, t_net):
        return a * x

    p = RectifiedFlowProcess(sample_steps=8)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, IMG, IMG, 1)) * 0.4
    exact, _, _ = p.likelihood(fn, None, x, jax.random.PRNGKey(0))
    ests = [
        float(p.likelihood(fn, None, x, jax.random.PRNGKey(i), hutchinson_type="gaussian")[0][0])
        for i in range(8)
    ]
    assert abs(np.mean(ests) - float(exact[0])) < 0.05
    with pytest.raises(ValueError):
        p.likelihood(fn, None, x, jax.random.PRNGKey(0), hutchinson_type="exact")
