"""Cascaded diffusion pipeline (pipelines/cascade.py) — Ho et al. 2022.

Correctness anchors:
  1. Geometry/channel validation fails loudly (wrong LR size, wrong
     channels, non-SR3 upscaler, empty chain).
  2. Key-stream contract: a cascade sample is BITWISE equal to running the
     stages by hand with fold_in(key, i) — and adding a second upscaler
     leaves the earlier stages' outputs bitwise unchanged.
  3. Two-stage chain 4→8→16 produces the right shapes at every stage.
  4. from_archives restores the same pipeline (bitwise-equal samples).
  5. SR3 conditioning augmentation: cond_aug_std > 0 perturbs exactly the
     conditioning channels during training (spy), changes the training
     loss, and cond_aug_std = 0 keeps the plain-SR3 loss bitwise unchanged;
     inference conditioning is never augmented; negative std rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ddpm_cfg(size, timesteps=6):
    return {
        "image_size": size,
        "channels": 1,
        "timesteps": timesteps,
        "compute_bpd": False,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": timesteps,
            "schedule_name": "linear",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


def _sr3_cfg(hr_size, scale=2, **over):
    cfg = _ddpm_cfg(hr_size)
    cfg.update({"scale_factor": scale, "lowres_method": "bicubic"})
    cfg.update(over)
    return cfg


def _base(size=8, seed=0):
    from diffusion_model_nemo_tpu.models import DDPM

    m = DDPM(cfg=_ddpm_cfg(size))
    m.init_params(jax.random.PRNGKey(seed))
    return m


def _sr3(hr_size=16, scale=2, seed=1, **over):
    from diffusion_model_nemo_tpu.models import SR3

    m = SR3(cfg=_sr3_cfg(hr_size, scale, **over))
    m.init_params(jax.random.PRNGKey(seed))
    return m


# ---- 1. validation -------------------------------------------------------------------
def test_geometry_and_type_validation():
    from diffusion_model_nemo_tpu.pipelines import CascadePipeline

    base8 = _base(8)
    with pytest.raises(ValueError):  # empty chain
        CascadePipeline(base8, [])
    with pytest.raises(ValueError):  # SR3@16/x4 wants 4x4 inputs, base makes 8x8
        CascadePipeline(base8, [_sr3(16, scale=4)])
    with pytest.raises(TypeError):  # a DDPM is not an upscaler
        CascadePipeline(base8, [_base(16)])
    # channel mismatch
    from diffusion_model_nemo_tpu.models import SR3

    cfg = _sr3_cfg(16, 2)
    cfg["channels"] = 3
    cfg["diffusion_model"]["channels"] = 3
    rgb_up = SR3(cfg=cfg)
    rgb_up.init_params(jax.random.PRNGKey(2))
    with pytest.raises(ValueError):
        CascadePipeline(base8, [rgb_up])

    pipe = CascadePipeline(base8, [_sr3(16, 2)])
    assert pipe.final_image_size == 16
    assert len(pipe.stages) == 2


# ---- 2+3. key-stream contract and two-stage shapes ------------------------------------
@pytest.mark.slow  # 27 s warm: cascade + two manual stage programs
def test_cascade_matches_manual_stages_bitwise():
    from diffusion_model_nemo_tpu.pipelines import CascadePipeline

    base = _base(4)
    up1 = _sr3(8, 2, seed=1)
    up2 = _sr3(16, 2, seed=2)
    key = jax.random.PRNGKey(42)

    pipe1 = CascadePipeline(base, [up1])
    one = pipe1.sample(3, key=key, return_stages=True)
    assert [np.asarray(s).shape for s in one] == [(3, 4, 4, 1), (3, 8, 8, 1)]

    pipe2 = CascadePipeline(base, [up1, up2])
    two = pipe2.sample(3, key=key, return_stages=True)
    assert [np.asarray(s).shape for s in two] == [
        (3, 4, 4, 1), (3, 8, 8, 1), (3, 16, 16, 1),
    ]
    # earlier stages unchanged by growing the chain
    for a, b in zip(one, two):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # manual composition with the documented keys reproduces the pipeline
    x0 = base.sample(3, 4, key=jax.random.fold_in(key, 0))
    x1 = up1.super_resolve(x0, key=jax.random.fold_in(key, 1))
    x2 = up2.super_resolve(x1, key=jax.random.fold_in(key, 2))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(two[-1]))
    assert np.isfinite(np.asarray(x2)).all()


# ---- 4. archives ------------------------------------------------------------------------
def test_from_archives_round_trip(tmp_path):
    from diffusion_model_nemo_tpu.pipelines import CascadePipeline

    base = _base(8)
    up = _sr3(16, 2)
    bp = base.save_to(str(tmp_path / "base.dmn"))
    sp = up.save_to(str(tmp_path / "sr3.dmn"))

    pipe = CascadePipeline(base, [up])
    restored = CascadePipeline.from_archives(bp, [sp])
    assert type(restored.base).__name__ == "DDPM"
    key = jax.random.PRNGKey(7)
    np.testing.assert_allclose(
        np.asarray(pipe.sample(2, key=key)),
        np.asarray(restored.sample(2, key=key)),
        atol=1e-6,
    )


# ---- 5. conditioning augmentation -------------------------------------------------------
@pytest.mark.slow  # 30 s warm: two SR3 train programs, bitwise compare
def test_cond_aug_perturbs_training_conditioning_only():
    from diffusion_model_nemo_tpu.models import SR3

    with pytest.raises(ValueError):
        SR3(cfg=_sr3_cfg(16, 2, cond_aug_std=-0.1))

    plain = _sr3(16, 2, seed=3)
    aug = _sr3(16, 2, seed=3, cond_aug_std=0.5)
    batch = {
        "pixel_values": jax.random.uniform(
            jax.random.PRNGKey(0), (4, 16, 16, 1), minval=-1.0, maxval=1.0
        )
    }
    key = jax.random.PRNGKey(9)

    # spy: the conditioning channel differs between plain/aug TRAIN binds,
    # by noise with roughly the configured std
    seen = {}

    def spy(params, x, t, classes=None, dropout_rng=None):
        seen["cond"] = x[..., 1:]
        return x[..., :1] * 0.0

    x_t = jnp.zeros((4, 16, 16, 1))
    t = jnp.zeros((4,), jnp.int32)
    for m, tag in ((plain, "plain"), (aug, "aug")):
        m.model_fn = spy
        m.get_model_fn(batch=batch, training=True, key=key)(None, x_t, t)
        seen[tag] = np.asarray(seen["cond"])
        del m.__dict__["model_fn"]
    delta = seen["aug"] - seen["plain"]
    assert abs(float(delta.std()) - 0.5) < 0.1
    assert float(np.abs(delta).max()) > 0.1

    # inference bind is never augmented
    for m, tag in ((plain, "plain"), (aug, "aug")):
        m.model_fn = spy
        m.get_model_fn(batch=batch, training=False)(None, x_t, t)
        seen[tag] = np.asarray(seen["cond"])
        del m.__dict__["model_fn"]
    np.testing.assert_array_equal(seen["aug"], seen["plain"])

    # training loss: aug differs from plain under the same key; std=0 bitwise-equal
    raw = {
        "image": np.random.default_rng(0).integers(
            0, 255, (4, 16, 16, 1), dtype=np.uint8
        )
    }
    l_plain, _ = plain.training_step(plain.params, raw, key, 0)
    l_aug, _ = aug.training_step(aug.params, raw, key, 0)
    assert float(l_plain) != float(l_aug)
    zero = _sr3(16, 2, seed=3, cond_aug_std=0.0)
    l_zero, _ = zero.training_step(zero.params, raw, key, 0)
    np.testing.assert_array_equal(np.asarray(l_plain), np.asarray(l_zero))
