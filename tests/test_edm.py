"""EDM-native training family (modules/edm_diffusion.py, loss/edm_loss.py,
models/edm.py) — Karras et al. 2022.

Correctness anchors:
  1. Preconditioning identities (Table 1): c_in^2 (sigma^2 + sd^2) = 1,
     lambda(sigma) c_out(sigma)^2 = 1, and the sigma -> 0 boundary
     D(x, sigma) -> x for ANY network output.
  2. The D-space weighted loss equals the F-space unit-weight MSE
     (the identity the preconditioning is designed to produce).
  3. Lognormal sigma sampling matches (P_mean, P_std) in log space.
  4. Constant-denoiser analytic field: the ODE dx/dsigma = (x - x*)/sigma has
     trajectories linear in sigma, so Euler AND Heun are EXACT on any grid —
     and the final sigma_min -> 0 transition lands exactly on x* even with
     churn on.
  5. Measured solver convergence on the Gaussian-posterior field (closed-form
     solution x(sigma) = mu + (x1 - mu) sqrt((s^2+sigma^2)/(s^2+sigma1^2))):
     Euler ~1st order, Heun ~2nd order.
  6. encode is the inverse of decode on the constant-denoiser field.
  7. Model e2e: jitted training_step decreases the loss, sampling
     shape/range, archive round trip (incl. the generic
     restore_model_from_archive dispatch), mesh-sharded sampling matches
     unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.loss import EDMLoss
from diffusion_model_nemo_tpu.modules import EDMProcess

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
            "_target_": "diffusion_model_nemo.modules.EDMProcess",
            "sample_steps": 8,
            "solver": "heun",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.EDMLoss",
            "sigma_data": 0.5,
            "reduction": "mean",
        },
    }
    cfg["sampler"].update(over)
    return cfg


def _constant_denoiser_field(x0_star, p: EDMProcess):
    """model_fn such that D(x, sigma) == x0* exactly.

    The process hands the network x_in = c_in * x and t = c_noise * scale;
    sigma is recovered exactly from t (c_noise = ln(sigma)/4 is invertible),
    so F = (x0* - c_skip * x) / c_out reproduces D = x0*.
    """
    x0s = jnp.asarray(x0_star, jnp.float32)

    def fn(params, x_in, t_net):
        sigma = jnp.exp(4.0 * t_net / p.time_scale).reshape(
            (-1,) + (1,) * (x_in.ndim - 1)
        )
        c_skip, c_out, c_in, _ = p.precond(sigma)
        x = x_in / c_in
        return (x0s - c_skip * x) / c_out

    return fn


# ---- 1. preconditioning identities ---------------------------------------------------
def test_preconditioning_identities():
    p = EDMProcess()
    sig = jnp.asarray([0.002, 0.1, 0.5, 1.0, 10.0, 80.0], jnp.float32)
    c_skip, c_out, c_in, c_noise = p.precond(sig)
    sd = p.sigma_data

    np.testing.assert_allclose(
        np.asarray(c_in**2 * (sig**2 + sd**2)), np.ones(6), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p.loss_weight(sig) * c_out**2), np.ones(6), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(c_noise), np.log(np.asarray(sig)) / 4, rtol=1e-6)
    # skip/out split preserves variance: c_skip^2 sd^2 + ... (Table 1 derivation)
    np.testing.assert_allclose(
        np.asarray(c_skip), sd**2 / (np.asarray(sig) ** 2 + sd**2), rtol=1e-6
    )


def test_denoiser_boundary_at_small_sigma():
    """As sigma -> 0, c_skip -> 1 and c_out -> 0: D -> x for any network."""
    p = EDMProcess()

    def garbage_net(params, x, t):
        return jnp.full_like(x, 123.0)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, IMG, IMG, 1))
    D = p.denoise(garbage_net, None, x, jnp.full((2,), 1e-6))
    np.testing.assert_allclose(np.asarray(D), np.asarray(x), atol=1e-3)


def test_q_sample_path():
    p = EDMProcess()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, IMG, IMG, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(3, IMG, IMG, 1)), jnp.float32)
    out = p.q_sample(x0, jnp.asarray([0.5, 1.0, 2.0]), eps)
    ref = np.asarray(x0) + np.asarray([0.5, 1.0, 2.0]).reshape(3, 1, 1, 1) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
    # scalar sigma fast path
    np.testing.assert_allclose(
        np.asarray(p.q_sample(x0, jnp.asarray(0.5), eps)),
        np.asarray(x0 + 0.5 * eps),
        rtol=1e-6,
    )


# ---- 2. loss identity -------------------------------------------------------------------
def test_loss_equals_f_space_mse():
    """lambda-weighted D-space loss == unit-weight F-space MSE."""
    p = EDMProcess()
    loss = EDMLoss(sigma_data=p.sigma_data, reduction="mean")
    rng = np.random.default_rng(1)
    B = 4
    x0 = jnp.asarray(rng.normal(size=(B, IMG, IMG, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(B, IMG, IMG, 1)), jnp.float32)
    sigma = jnp.asarray(np.exp(rng.normal(size=B)), jnp.float32)
    F_out = jnp.asarray(rng.normal(size=(B, IMG, IMG, 1)), jnp.float32)

    x = p.q_sample(x0, sigma, eps)
    sig_b = sigma.reshape(B, 1, 1, 1)
    c_skip, c_out, c_in, _ = p.precond(sig_b)
    D = c_skip * x + c_out * F_out

    d_space = float(loss(input=D, target=x0, sigma=sigma))
    F_target = (x0 - c_skip * x) / c_out
    f_space = float(jnp.mean((F_out - F_target) ** 2))
    np.testing.assert_allclose(d_space, f_space, rtol=1e-5)


def test_loss_reductions_and_validation():
    loss = EDMLoss(sigma_data=0.5, reduction="none")
    x = jnp.ones((2, 4, 4, 1))
    out = loss(input=x, target=jnp.zeros_like(x), sigma=jnp.ones((2,)))
    assert out.shape == (2, 4, 4, 1)
    w = float(loss.weight(jnp.asarray(1.0)))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], w, rtol=1e-6)
    with pytest.raises(ValueError):
        EDMLoss(sigma_data=0.0)
    with pytest.raises(AssertionError):
        EDMLoss(reduction="max")


# ---- 3. sigma sampling --------------------------------------------------------------------
def test_lognormal_sigma_sampling():
    p = EDMProcess(p_mean=-1.2, p_std=1.2)
    sig = np.asarray(p.sample_sigmas(jax.random.PRNGKey(0), 8192))
    assert np.all(sig > 0)
    log_sig = np.log(sig)
    assert abs(log_sig.mean() - (-1.2)) < 0.05
    assert abs(log_sig.std() - 1.2) < 0.05


def test_invalid_args_raise():
    with pytest.raises(ValueError):
        EDMProcess(solver="rk45")
    with pytest.raises(ValueError):
        EDMProcess(sample_steps=1)
    with pytest.raises(ValueError):
        EDMProcess(sigma_min=2.0, sigma_max=1.0)
    with pytest.raises(ValueError):
        EDMProcess(sigma_data=0.0)


# ---- 4. exactness on the constant-denoiser field --------------------------------------------
@pytest.mark.parametrize(
    "solver,steps,churn",
    [("euler", 2, 0.0), ("euler", 7, 0.0), ("heun", 2, 0.0), ("heun", 5, 0.0), ("heun", 5, 10.0)],
)
def test_exact_on_constant_denoiser(solver, steps, churn):
    x0_star = np.full((1, IMG, IMG, 1), 0.3, np.float32)
    p = EDMProcess(sample_steps=steps, solver=solver, s_churn=churn)
    fn = _constant_denoiser_field(x0_star, p)
    out = p.p_sample_loop(fn, None, (4, IMG, IMG, 1), jax.random.PRNGKey(1), unnormalize=False)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(x0_star, (4, IMG, IMG, 1)), atol=1e-4
    )


def test_frames_end_at_sample():
    x0_star = np.full((1, IMG, IMG, 1), -0.2, np.float32)
    p = EDMProcess(sample_steps=5, solver="heun")
    fn = _constant_denoiser_field(x0_star, p)
    out, frames = p.p_sample_loop(
        fn, None, (2, IMG, IMG, 1), jax.random.PRNGKey(0), return_frames=True
    )
    assert frames.shape == (5, 2, IMG, IMG, 1)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(out), atol=1e-6)


# ---- 5. convergence orders -------------------------------------------------------------------
def _gaussian_field_error(solver, steps):
    """Data ~ N(mu, s^2 I): D(x, sigma) = (s^2 x + sigma^2 mu)/(s^2 + sigma^2);
    closed form x(sigma) = mu + (x1 - mu) sqrt((s^2+sigma^2)/(s^2+sigma1^2))."""
    mu, s = 0.2, 0.7
    # sigma_min sets the fixed final-Euler boundary error (~sigma_min^2/(2 s^2)
    # relative) — keep it well below the solver error at these grid sizes
    p = EDMProcess(sample_steps=steps, solver=solver, sigma_min=0.01, sigma_max=20.0)

    def fn(params, x_in, t_net):
        sigma = jnp.exp(4.0 * t_net / p.time_scale).reshape((-1,) + (1,) * (x_in.ndim - 1))
        c_skip, c_out, c_in, _ = p.precond(sigma)
        x = x_in / c_in
        D = (s**2 * x + sigma**2 * mu) / (s**2 + sigma**2)
        return (D - c_skip * x) / c_out

    x1 = jnp.full((1, IMG, IMG, 1), 5.0)
    sig0 = p.sigma_max
    out = p.p_sample_loop(fn, None, x1.shape, jax.random.PRNGKey(0), img=x1, unnormalize=False)
    # exact endpoint at sigma = 0
    exact = mu + (5.0 - mu) * np.sqrt(s**2 / (s**2 + sig0**2))
    return abs(float(out[0, 0, 0, 0]) - exact)


def test_solver_convergence_orders():
    e_euler = [_gaussian_field_error("euler", m) for m in (16, 32, 64)]
    e_heun = [_gaussian_field_error("heun", m) for m in (16, 32, 64)]
    for a, b in zip(e_euler[:-1], e_euler[1:]):
        assert 1.5 < a / b < 2.6, (e_euler,)  # ~1st order (measured 2.00x)
    for a, b in zip(e_heun[:-1], e_heun[1:]):
        assert a / b > 3.0, (e_heun,)  # ~2nd order (measured 4.4-4.5x)
    assert e_heun[-1] < e_euler[-1] / 3


# ---- 6. encode/decode inversion ------------------------------------------------------------------
def test_encode_inverts_decode_on_constant_denoiser():
    x0_star = np.full((1, IMG, IMG, 1), 0.1, np.float32)
    p = EDMProcess(sample_steps=6, solver="heun")
    fn = _constant_denoiser_field(x0_star, p)
    # start from a point on the sigma_min marginal: decode from sigma_max
    z = jax.random.normal(jax.random.PRNGKey(2), (3, IMG, IMG, 1)) * p.sigma_max
    x0 = p.p_sample_loop(fn, None, z.shape, jax.random.PRNGKey(0), img=z, unnormalize=False)
    z_back = p.encode(fn, None, x0)
    # the trajectory is linear in sigma, so the reversed grid retraces it
    # exactly EXCEPT the final sigma_min -> 0 transition (skipped by encode);
    # on the constant field that transition collapses x to x0* exactly, so
    # encode from x0* reproduces... x0* scalings — compare through a decode
    x0_again = p.p_sample_loop(fn, None, z.shape, jax.random.PRNGKey(0), img=z_back, unnormalize=False)
    np.testing.assert_allclose(np.asarray(x0_again), np.asarray(x0), atol=1e-4)


def test_encode_decode_roundtrip_gaussian_field():
    """On the Gaussian-posterior field the ODE is exactly reversible; encode
    then decode must return the input up to solver error."""
    mu, s = 0.0, 0.7
    p = EDMProcess(sample_steps=64, solver="heun", sigma_min=0.05, sigma_max=5.0)

    def fn(params, x_in, t_net):
        sigma = jnp.exp(4.0 * t_net / p.time_scale).reshape((-1,) + (1,) * (x_in.ndim - 1))
        c_skip, c_out, c_in, _ = p.precond(sigma)
        x = x_in / c_in
        D = (s**2 * x + sigma**2 * mu) / (s**2 + sigma**2)
        return (D - c_skip * x) / c_out

    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, IMG, IMG, 1)) * 0.5
    z = p.encode(fn, None, x0)
    # decode skipping the final sigma_min -> 0 step is not available on the
    # public surface; integrate the full grid and accept the small tail error
    x_back = p.p_sample_loop(fn, None, z.shape, jax.random.PRNGKey(0), img=z, unnormalize=False)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x0), atol=0.02)


# ---- 6b. probability-flow NLL --------------------------------------------------------------------
def _gaussian_denoiser(p: EDMProcess, mu: float, s: float):
    """Analytic posterior-mean denoiser for data ~ N(mu, s^2 I)."""

    def fn(params, x_in, t_net):
        sigma = jnp.exp(4.0 * t_net / p.time_scale).reshape((-1,) + (1,) * (x_in.ndim - 1))
        c_skip, c_out, c_in, _ = p.precond(sigma)
        x = x_in / c_in
        D = (s**2 * x + sigma**2 * mu) / (s**2 + sigma**2)
        return (D - c_skip * x) / c_out

    return fn


def test_likelihood_matches_analytic_gaussian_nll():
    """The analytic N(mu, s^2) denoiser must assign the N(mu, s^2) NLL —
    up to the sigma_min boundary truncation (relative O(sigma_min^2/s^2))."""
    mu, s = 0.1, 0.7
    p = EDMProcess(sample_steps=128, solver="heun", sigma_min=0.01, sigma_max=20.0)
    fn = _gaussian_denoiser(p, mu, s)
    x = mu + jax.random.normal(jax.random.PRNGKey(0), (2, IMG, IMG, 1)) * s
    bpd, z, nfe = p.likelihood(fn, None, x, jax.random.PRNGKey(1))
    D = IMG * IMG
    x_np = np.asarray(x).reshape(2, -1)
    logp = -0.5 * (((x_np - mu) ** 2).sum(1) / (s * s) + D * np.log(2 * np.pi * s * s))
    expect = -logp / np.log(2) / D + 7.0
    np.testing.assert_allclose(np.asarray(bpd), expect, rtol=3e-3)
    assert float(nfe) == 2 * 127
    # the latent reaches the sigma_max marginal scale
    assert 0.5 * p.sigma_max < float(np.asarray(z).std()) < 2.0 * p.sigma_max


def test_likelihood_hutchinson_and_validation():
    mu, s = 0.0, 0.5
    p = EDMProcess(sample_steps=16, sigma_min=0.05, sigma_max=10.0)
    fn = _gaussian_denoiser(p, mu, s)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, IMG, IMG, 1)) * s
    exact, _, _ = p.likelihood(fn, None, x, jax.random.PRNGKey(0))
    # gaussian probes are unbiased but NOISY here (the divergence integrand
    # spans sigma in [0.05, 10]; measured per-probe std ~0.73 bpd at D=64) —
    # bound the 16-probe mean by 3 standard errors
    ests = [
        float(
            p.likelihood(fn, None, x, jax.random.PRNGKey(i), hutchinson_type="gaussian")[0][0]
        )
        for i in range(16)
    ]
    se = np.std(ests) / np.sqrt(len(ests))
    assert np.std(ests) > 0.01  # probes genuinely vary (not silently rademacher)
    assert abs(np.mean(ests) - float(exact[0])) < max(3.0 * se, 0.1), (
        np.mean(ests), float(exact[0]), se,
    )
    with pytest.raises(ValueError):
        p.likelihood(fn, None, x, jax.random.PRNGKey(0), hutchinson_type="exact")


# ---- 7. model e2e -----------------------------------------------------------------------------
def _batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {"image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)}


@pytest.mark.slow  # 166 s: full EDM train loop + sampler compile
def test_model_training_decreases_loss_and_samples():
    from diffusion_model_nemo_tpu.models import EDM

    model = EDM(cfg=_tiny_cfg())
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
    assert np.all(np.isfinite(np.asarray(out)))

    # num_steps override
    out5 = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2), num_steps=5)
    assert out5.shape == (2, IMG, IMG, 1)

    # interpolate through the latent
    x = jnp.asarray(np.asarray(out), jnp.float32)
    mix = model.interpolate(x, x[::-1], lambd=0.5)
    assert mix.shape == x.shape
    assert np.all(np.isfinite(np.asarray(mix)))

    # bits/dim = the probability-flow-ODE NLL (boundary-truncated)
    bpd_dict = model.calculate_bits_per_dimension(x * 2.0 - 1.0)
    assert bpd_dict["total_bpd"].shape == (x.shape[0],)
    assert np.isfinite(np.asarray(bpd_dict["total_bpd"])).all()

    # test_step NLL opt-in
    model.cfg["compute_nll"] = True
    out_t = model.test_step(next(_batches()), 0)
    assert "bpds" in out_t and np.isfinite(float(out_t["bpds"]))


def test_sigma_data_mismatch_rejected():
    from diffusion_model_nemo_tpu.models import EDM

    cfg = _tiny_cfg()
    cfg["loss"]["sigma_data"] = 0.7
    with pytest.raises(ValueError):
        EDM(cfg=cfg)


def test_archive_round_trip(tmp_path):
    from diffusion_model_nemo_tpu.models import EDM, restore_model_from_archive

    model = EDM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    path = model.save_to(str(tmp_path / "edm.dmn"))

    loaded = restore_model_from_archive(path)
    assert type(loaded).__name__ == "EDM"
    assert loaded.sampler.sample_steps == model.sampler.sample_steps

    key = jax.random.PRNGKey(3)
    a = model.sample(batch_size=2, image_size=IMG, key=key)
    b = loaded.sample(batch_size=2, image_size=IMG, key=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_sharded_sampling_matches():
    from diffusion_model_nemo_tpu.models import EDM
    from diffusion_model_nemo_tpu.parallel import make_mesh

    model = EDM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(4)
    plain = model.sample(batch_size=16, image_size=IMG, key=key)

    mesh = make_mesh(jax.devices()[:8])
    sharded = model.sample(batch_size=16, image_size=IMG, key=key, mesh=mesh)
    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_test_step_aggregation():
    from diffusion_model_nemo_tpu.models import EDM

    model = EDM(cfg=_tiny_cfg())
    model.init_params(jax.random.PRNGKey(0))
    batch = next(_batches())
    out = model.test_step(batch, 0)
    assert int(out["num_samples"]) == 8
    agg = model.test_epoch_end([out, out])
    assert np.isfinite(agg["test_edm_loss"])
