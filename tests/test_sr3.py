"""SR3 super-resolution family (models/sr3.py) — Saharia et al. 2021.

Correctness anchors:
  1. The network is built with 2C input channels ([x_t, up(LR)] concat) and
     C output channels; degrade/upsample shapes and round-trip sanity.
  2. Conditioning is load-bearing: the same (x_t, t) under two different LR
     conditionings produces different outputs, and the bound model_fn feeds
     exactly [x, cond] on channels (spy network).
  3. Analytic conditioning anchor: a fake denoiser that treats the
     conditioning channel as the data point mass makes super_resolve return
     (approximately) the upsampled LR — proving the conditioning flows
     through the fused sampling scan end to end.
  4. Model e2e: jitted training_step decreases the loss, super_resolve
     shapes/range/determinism, DDIM swap works on the conditioned model,
     conditional bits/dim runs, archive round trip (generic restore),
     mesh-sharded super_resolve matches unsharded, PSNR sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

IMG = 8  # HR size
SCALE = 2


def _tiny_cfg(**over):
    cfg = {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 10,
        "compute_bpd": False,
        "scale_factor": SCALE,
        "lowres_method": "bicubic",
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }
    cfg.update(over)
    return cfg


def _model(**over):
    from diffusion_model_nemo_tpu.models import SR3

    m = SR3(cfg=_tiny_cfg(**over))
    m.init_params(jax.random.PRNGKey(0))
    return m


def _batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {"image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)}


# ---- 1. construction ------------------------------------------------------------------
def test_network_input_channels_and_resize_shapes():
    m = _model()
    stem = m.params["init_conv"]["kernel"]
    assert stem.shape[2] == 2  # 2C = 2 for C = 1
    x = jnp.zeros((3, IMG, IMG, 1))
    lr = m.degrade(x)
    assert lr.shape == (3, IMG // SCALE, IMG // SCALE, 1)
    up = m.upsample(lr)
    assert up.shape == (3, IMG, IMG, 1)
    # constant images survive the resize round trip exactly
    const = jnp.full((1, IMG, IMG, 1), 0.3)
    np.testing.assert_allclose(
        np.asarray(m._lowres_condition(const)), 0.3, atol=1e-6
    )


def test_invalid_cfg_rejected():
    from diffusion_model_nemo_tpu.models import SR3

    with pytest.raises(ValueError):
        SR3(cfg=_tiny_cfg(scale_factor=3))  # 8 % 3 != 0
    with pytest.raises(ValueError):
        SR3(cfg=_tiny_cfg(scale_factor=1))
    with pytest.raises(ValueError):
        SR3(cfg=_tiny_cfg(lowres_method="area"))


# ---- 2. conditioning is load-bearing ------------------------------------------------------
def test_conditioning_reaches_network():
    m = _model()
    seen = {}

    def spy(params, x, t, classes=None, dropout_rng=None):
        seen["shape"] = x.shape
        return x[..., :1] * 0.0

    m.model_fn = spy
    cond = jnp.zeros((2, IMG, IMG, 1))
    fn = m.get_model_fn(cond=cond)
    fn(None, jnp.ones((2, IMG, IMG, 1)), jnp.zeros((2,)))
    assert seen["shape"] == (2, IMG, IMG, 2)

    # different conditioning -> different real-network output
    fn_real_a = m.get_model_fn(cond=jnp.full((1, IMG, IMG, 1), -0.5))
    fn_real_b = m.get_model_fn(cond=jnp.full((1, IMG, IMG, 1), 0.5))
    del m.__dict__["model_fn"]  # restore the class method
    x_t = jax.random.normal(jax.random.PRNGKey(1), (1, IMG, IMG, 1))
    t = jnp.zeros((1,))
    a = fn_real_a(m.params, x_t, t)
    b = fn_real_b(m.params, x_t, t)
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_unbound_model_fn_fails_loudly():
    m = _model()
    fn = m.get_model_fn()
    with pytest.raises(ValueError):
        fn(m.params, jnp.zeros((1, IMG, IMG, 1)), jnp.zeros((1,)))


# ---- 3. analytic conditioning anchor -------------------------------------------------------
def test_super_resolve_recovers_conditioning_point_mass():
    """Fake denoiser: eps-hat for a point mass AT the conditioning image —
    the ancestral chain contracts to up(LR), so the SR output ≈ up(LR)."""
    m = _model()
    c = m.sampler.constants

    def fake(params, x, t, classes=None, dropout_rng=None):
        x_t, cond = x[..., :1], x[..., 1:]
        a = c.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        s = c.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        return (x_t - a * cond) / jnp.maximum(s, 1e-8)

    m.model_fn = fake
    lr = jnp.full((2, IMG // SCALE, IMG // SCALE, 1), 0.7, jnp.float32)  # [0,1]
    out = np.asarray(m.super_resolve(lr, key=jax.random.PRNGKey(0)))
    # up(LR) in display space is 0.7 everywhere (constant image)
    assert abs(out.mean() - 0.7) < 0.05
    assert out.std() < 0.05


# ---- 4. model e2e ----------------------------------------------------------------------------
def test_training_decreases_loss_and_super_resolves():
    import optax

    m = _model()
    tx = optax.adam(2e-3)
    params = m.params
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        (loss, _), g = jax.value_and_grad(m.training_step, has_aux=True)(
            params, batch, key, 0
        )
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    batches = _batches()
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, next(batches), sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    m.params = params

    lr = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(2), (2, IMG // SCALE, IMG // SCALE, 1)),
        0.0, 1.0,
    )
    sr = m.super_resolve(lr, key=jax.random.PRNGKey(3))
    assert sr.shape == (2, IMG, IMG, 1)
    assert np.isfinite(np.asarray(sr)).all()
    # determinism
    sr2 = m.super_resolve(lr, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr2))

    # sample() without lr and without a dataloader fails loudly
    with pytest.raises(ValueError):
        m.sample(batch_size=2, image_size=IMG)
    # interpolate is undefined for the conditioned model
    with pytest.raises(NotImplementedError):
        m.interpolate(sr, sr)

    # PSNR sanity: identical images -> huge, differing -> finite ordering
    hr = jnp.clip(jax.random.uniform(jax.random.PRNGKey(4), (2, IMG, IMG, 1)), 0, 1)
    p_same = np.asarray(m.psnr(hr, hr))
    p_diff = np.asarray(m.psnr(hr, 1.0 - hr))
    assert (p_same > 60).all() and (p_same > p_diff).all()


def test_ddim_swap_on_sr3():
    m = _model()
    m.change_sampler(
        {
            "_target_": "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
            "eta": 0.0,
            "ddim_timesteps": 4,
        }
    )
    lr = jnp.full((1, IMG // SCALE, IMG // SCALE, 1), 0.5)
    sr = m.super_resolve(lr, key=jax.random.PRNGKey(0))
    assert sr.shape == (1, IMG, IMG, 1)
    assert np.isfinite(np.asarray(sr)).all()


def test_conditional_bits_per_dimension():
    m = _model()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, IMG, IMG, 1)) * 2.0 - 1.0
    out = m.calculate_bits_per_dimension(x, key=jax.random.PRNGKey(1))
    assert out["total_bpd"].shape == (2,)
    assert out["terms_bpd"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()


def test_archive_round_trip(tmp_path):
    from diffusion_model_nemo_tpu.models import restore_model_from_archive

    m = _model()
    path = m.save_to(str(tmp_path / "sr3.dmn"))
    loaded = restore_model_from_archive(path)
    assert type(loaded).__name__ == "SR3"
    assert loaded.scale_factor == SCALE

    lr = jnp.full((1, IMG // SCALE, IMG // SCALE, 1), 0.4)
    key = jax.random.PRNGKey(5)
    a = m.super_resolve(lr, key=key)
    b = loaded.super_resolve(lr, key=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mesh_sharded_super_resolve_matches():
    from diffusion_model_nemo_tpu.parallel import make_mesh

    m = _model()
    lr = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(6), (16, IMG // SCALE, IMG // SCALE, 1)),
        0.0, 1.0,
    )
    key = jax.random.PRNGKey(7)
    plain = m.super_resolve(lr, key=key)
    mesh = make_mesh(jax.devices()[:8])
    sharded = m.super_resolve(lr, key=key, mesh=mesh)
    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_sample_dump_path_uses_dataset_lr():
    """The Trainer's periodic grid dump calls sample(batch_size, image_size):
    SR3 derives the LR conditioning from the attached dataloader."""
    m = _model()
    m.setup_training_data(
        {
            "name": "synthetic",
            "batch_size": 8,
            "image_size": IMG,
            "channels": 1,
            "length": 16,
            "shuffle": False,
            "num_workers": 0,
        }
    )
    out = m.sample(batch_size=4, image_size=IMG, key=jax.random.PRNGKey(0))
    assert out.shape == (4, IMG, IMG, 1)
    assert np.isfinite(np.asarray(out)).all()