"""Latent diffusion stack: AutoencoderKL module math, the trainable
AutoencoderKLModel, and LatentDiffusion (train/sample/interpolate/archive)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import (
    AutoencoderKLModel,
    LatentDiffusion,
    restore_model_from_archive,
)
from diffusion_model_nemo_tpu.modules import (
    AutoencoderKL,
    diagonal_gaussian_kl,
    diagonal_gaussian_sample,
)
from diffusion_model_nemo_tpu.training import Trainer

IMG = 16
ZC = 4


def ae_model_cfg(tmp_path, **extra):
    cfg = {
        "image_size": IMG,
        "channels": 3,
        "kl_weight": 1e-6,
        "save_every": 0,
        "results_dir": str(tmp_path / "results"),
        "train_ds": {
            "name": "synthetic",
            "image_size": IMG,
            "channels": 3,
            "length": 32,
            "batch_size": 8,
            "shuffle": True,
        },
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.AutoencoderKL",
            "dim": 8,
            "dim_mults": [1, 2],
            "z_channels": ZC,
            "channels": 3,
            "resnet_block_groups": 4,
        },
        "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l1"},
        "optim": {"name": "adamw", "lr": 1e-3},
    }
    cfg.update(extra)
    return from_dict(cfg)


def ld_model_cfg(tmp_path, first_stage, **extra):
    cfg = {
        "image_size": IMG,
        "timesteps": 6,
        "channels": 3,
        "save_every": 0,
        "results_dir": str(tmp_path / "results"),
        "first_stage": first_stage,
        "scale_factor": 1.0,
        "posterior_sample": True,
        "train_ds": {
            "name": "synthetic",
            "image_size": IMG,
            "channels": 3,
            "length": 32,
            "batch_size": 8,
            "shuffle": True,
        },
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "input_dim": IMG // 2,
            "dim": 8,
            "channels": ZC,
            "dim_mults": [1, 2],
            "use_convnext": False,
            "resnet_block_groups": 4,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 6,
            "schedule_name": "linear",
            "schedule_cfg": {"linear": {"beta_start": 1e-4, "beta_end": 0.02}},
        },
        "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
        "optim": {"name": "adamw", "lr": 1e-3},
    }
    cfg.update(extra)
    return from_dict(cfg)


def make_batch(n=8, seed=0):
    rng = np.random.RandomState(seed)
    return {"image": rng.randint(0, 256, (n, IMG, IMG, 3)).astype(np.uint8)}


# ---- module math ---------------------------------------------------------------


def test_diagonal_gaussian_kl_matches_numpy(rng):
    mean = jax.random.normal(rng, (4, 3, 3, 2))
    logvar = jax.random.normal(jax.random.fold_in(rng, 1), (4, 3, 3, 2))
    got = np.asarray(diagonal_gaussian_kl(mean, logvar))
    m, lv = np.asarray(mean, np.float64), np.asarray(logvar, np.float64)
    want = 0.5 * (m**2 + np.exp(lv) - 1.0 - lv).reshape(4, -1).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # zero KL at the prior
    z = jnp.zeros((2, 3))
    np.testing.assert_allclose(np.asarray(diagonal_gaussian_kl(z, z)), 0.0, atol=1e-7)


def test_diagonal_gaussian_sample_stats(rng):
    mean = jnp.full((200, 8), 2.0)
    logvar = jnp.full((200, 8), np.log(0.25))
    z = diagonal_gaussian_sample(mean, logvar, rng)
    assert abs(float(z.mean()) - 2.0) < 0.1
    assert abs(float(z.std()) - 0.5) < 0.1
    # key=None returns the mode exactly
    np.testing.assert_array_equal(
        np.asarray(diagonal_gaussian_sample(mean, logvar, None)), np.asarray(mean)
    )


def test_autoencoder_shapes_and_factor(rng):
    ae = AutoencoderKL(dim=8, dim_mults=(1, 2, 4), z_channels=ZC, channels=3)
    assert ae.downsample_factor == 4
    x = jax.random.normal(rng, (2, IMG, IMG, 3))
    params = ae.init({"params": rng}, x)["params"]
    rec, mean, logvar = ae.apply({"params": params}, x, rng)
    assert rec.shape == x.shape
    assert mean.shape == logvar.shape == (2, IMG // 4, IMG // 4, ZC)
    # encode/decode halves round-trip the shapes
    m2, _ = ae.apply({"params": params}, x, method="encode")
    assert m2.shape == (2, IMG // 4, IMG // 4, ZC)
    y = ae.apply({"params": params}, m2, method="decode")
    assert y.shape == x.shape


# ---- AutoencoderKLModel ----------------------------------------------------------


@pytest.mark.slow  # 41 s warm: full VAE training loop
def test_autoencoder_model_training_reduces_loss(tmp_path):
    model = AutoencoderKLModel(cfg=ae_model_cfg(tmp_path))
    model.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch())

    step = jax.jit(lambda p, b, k: model.training_step(p, b, k, 0))
    loss0, m0 = step(model.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss0))
    assert float(m0["kl"]) >= 0.0

    trainer = Trainer(devices=-1, max_steps=4, log_every_n_steps=1)
    trainer.fit(model)
    lossN, _ = step(model.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(lossN))


def test_autoencoder_model_services_and_archive(tmp_path):
    model = AutoencoderKLModel(cfg=ae_model_cfg(tmp_path))
    model.init_params(jax.random.PRNGKey(0))

    x01 = jnp.asarray(make_batch(4)["image"], jnp.float32) / 255.0
    rec = model.reconstruct(x01)
    assert rec.shape == x01.shape
    assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0

    s = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(3))
    assert s.shape == (2, IMG, IMG, 3)

    mid = model.interpolate(x01[:2], x01[2:], lambd=0.5)
    assert mid.shape == (2, IMG, IMG, 3)

    out = model.test_step(make_batch(4), 0)
    res = model.test_epoch_end([out])
    assert np.isfinite(res["test_rec_mse"]) and np.isfinite(res["test_rec_psnr"])

    path = model.save_to(str(tmp_path / "ae.dmn"))
    restored = AutoencoderKLModel.restore_from(path)
    np.testing.assert_allclose(
        np.asarray(restored.reconstruct(x01)), np.asarray(rec), atol=1e-6
    )


# ---- LatentDiffusion ---------------------------------------------------------------


@pytest.fixture(scope="module")
def ae_archive(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ae")
    model = AutoencoderKLModel(cfg=ae_model_cfg(tmp))
    model.init_params(jax.random.PRNGKey(0))
    return model.save_to(str(tmp / "ae.dmn"))


def test_latent_diffusion_geometry_and_validation(tmp_path, ae_archive):
    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, {"restore_from": ae_archive}))
    assert model.latent_size == IMG // 2
    assert model.latent_channels == ZC
    model.init_params(jax.random.PRNGKey(0))
    # the U-Net was initialized at LATENT geometry
    stem = jax.tree.leaves(model.params)[0]
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(model.params))

    # channel mismatch between U-Net and first stage is rejected at build
    bad = ld_model_cfg(tmp_path, {"restore_from": ae_archive})
    bad["diffusion_model"]["channels"] = ZC + 1
    with pytest.raises(ValueError, match="z_channels"):
        LatentDiffusion(cfg=bad)


@pytest.mark.slow  # 76 s: VAE + latent train + sample + interpolate compiles
def test_latent_diffusion_train_sample_interpolate(tmp_path, ae_archive):
    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, {"restore_from": ae_archive}))
    model.init_params(jax.random.PRNGKey(0))

    sf = model.calibrate_scale_factor(make_batch())
    assert sf > 0 and np.isfinite(sf)
    assert float(model.cfg["scale_factor"]) == pytest.approx(sf)

    trainer = Trainer(devices=-1, max_steps=3, log_every_n_steps=1)
    trainer.fit(model)

    imgs = model.sample(batch_size=4, image_size=IMG, key=jax.random.PRNGKey(1))
    assert imgs.shape == (4, IMG, IMG, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0

    x01 = jnp.asarray(make_batch(4)["image"], jnp.float32) / 255.0
    mid = model.interpolate(x01[:2], x01[2:], t=3)
    assert mid.shape == (2, IMG, IMG, 3)

    out = model.test_step(make_batch(4), 0)
    res = model.test_epoch_end([out])
    assert np.isfinite(res["test_latent_loss"])

    # unsupported pixel-family services fail loudly, not silently wrong
    with pytest.raises(NotImplementedError):
        model.sample(batch_size=2, image_size=IMG, return_frames=True)
    with pytest.raises(NotImplementedError):
        model.inpaint(x01, jnp.ones_like(x01))


def test_latent_diffusion_archive_roundtrip(tmp_path, ae_archive):
    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, {"restore_from": ae_archive}))
    model.init_params(jax.random.PRNGKey(0))
    model.calibrate_scale_factor(make_batch())
    key = jax.random.PRNGKey(7)
    imgs = model.sample(batch_size=2, image_size=IMG, key=key)

    path = model.save_to(str(tmp_path / "ld.dmn"))
    # the archive is self-contained: restore WITHOUT the original ae.dmn
    restored = LatentDiffusion.restore_from(path)
    assert float(restored.scale_factor) == pytest.approx(float(model.scale_factor))
    np.testing.assert_allclose(
        np.asarray(restored.sample(batch_size=2, image_size=IMG, key=key)),
        np.asarray(imgs),
        atol=1e-5,
    )
    # generic (class-agnostic) restore dispatches to LatentDiffusion
    generic = restore_model_from_archive(path)
    assert type(generic).__name__ == "LatentDiffusion"


def test_latent_diffusion_ddim_swap(tmp_path, ae_archive):
    """Fast-sampler hot-swap works in latent space (DDIM over the latent
    chain, decode unchanged)."""
    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, {"restore_from": ae_archive}))
    model.init_params(jax.random.PRNGKey(0))
    sampler_cfg = dict(model.cfg.sampler)
    sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
    sampler_cfg["eta"] = 0.0
    sampler_cfg["ddim_timesteps"] = 3
    model.change_sampler(sampler_cfg)
    imgs = model.sample(batch_size=2, image_size=IMG, key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, IMG, IMG, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_latent_diffusion_inline_first_stage(tmp_path):
    """Inline autoencoder spec (no archive): random-init first stage."""
    fs = {
        "autoencoder": {
            "_target_": "diffusion_model_nemo.modules.AutoencoderKL",
            "dim": 8,
            "dim_mults": [1, 2],
            "z_channels": ZC,
            "channels": 3,
            "resnet_block_groups": 4,
        }
    }
    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, fs))
    model.init_params(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch())
    loss, _ = jax.jit(lambda p, b, k: model.training_step(p, b, k, 0))(
        model.params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))


def test_latent_diffusion_mesh_sampling(tmp_path, ae_archive):
    """Batch-sharded latent sampling over the 8-device mesh matches the
    unsharded result (params replicated, latents + decode sharded)."""
    from diffusion_model_nemo_tpu.parallel import make_mesh

    model = LatentDiffusion(cfg=ld_model_cfg(tmp_path, {"restore_from": ae_archive}))
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    ref = model.sample(batch_size=8, image_size=IMG, key=key)
    mesh = make_mesh()
    sharded = model.sample(batch_size=8, image_size=IMG, key=key, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), atol=1e-5)
