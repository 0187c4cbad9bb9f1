"""Non-leaky augmentation pipeline (data/augment.py) + EDM integration.

Correctness anchors:
  1. Zero descriptor is the identity BITWISE (p=0, and apply_augment on an
     all-zero descriptor): the non-leaky convention needs exactness, not
     approximation.
  2. Each transform is exact where its geometry has a closed form: flips
     equal jnp.flip, whole-pixel translation is a shift with zero padding,
     a 90-degree rotation equals jnp.rot90.
  3. The network hook: with aug_dim set, a None descriptor equals a zero
     descriptor exactly (no-bias zero-init Dense), the shared parameter
     leaves are unchanged, and the descriptor only matters once the
     aug_embed kernel is non-zero.
  4. EDM integration: augment_prob=0 keeps the training loss bitwise equal
     to the never-configured model under the same key stream; the network
     sees the descriptor during training and nothing at sampling (spied);
     misconfiguration (augment_prob without aug_dim) fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.data.augment import (
    AUGMENT_DIM,
    apply_augment,
    augment_pipe,
    sample_augment_labels,
)


def _imgs(B=4, H=8, C=3, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, (B, H, H, C)), jnp.float32
    )


def _desc(B=4, **cols):
    lab = jnp.zeros((B, AUGMENT_DIM))
    for idx, val in cols.items():
        lab = lab.at[:, int(idx[1:])].set(val)
    return lab


def test_zero_probability_and_zero_descriptor_are_identity():
    x = _imgs()
    y, lab = augment_pipe(x, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert (np.asarray(lab) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(apply_augment(x, jnp.zeros((4, AUGMENT_DIM)))), np.asarray(x)
    )


def test_flips_and_translation_exact():
    x = _imgs()
    np.testing.assert_array_equal(
        np.asarray(apply_augment(x, _desc(c0=1.0))), np.asarray(jnp.flip(x, axis=2))
    )
    np.testing.assert_array_equal(
        np.asarray(apply_augment(x, _desc(c1=1.0))), np.asarray(jnp.flip(x, axis=1))
    )
    # translate exactly one pixel right: new left column is padding (zeros)
    y = apply_augment(x, _desc(c2=1.0 / 8))
    np.testing.assert_array_equal(np.asarray(y[:, :, 1:]), np.asarray(x[:, :, :-1]))
    assert (np.asarray(y[:, :, 0]) == 0).all()


def test_rot90_exact():
    x = _imgs()
    y = apply_augment(x, _desc(c5=-1.0, c6=1.0))  # cos=0, sin=1
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.rot90(x, k=-1, axes=(1, 2))), atol=1e-6
    )


def test_label_sampling_determinism_and_gating():
    l1 = sample_augment_labels(jax.random.PRNGKey(3), 256, 1.0)
    l2 = sample_augment_labels(jax.random.PRNGKey(3), 256, 1.0)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    l = np.asarray(l1)
    assert 0.3 < l[:, 0].mean() < 0.7  # xflip engages on ~half (gate*coin)
    assert (np.abs(l[:, 6]) > 1e-6).any()  # rotations drawn
    assert (l[:, 1] == 0).all() and (l[:, 8] == 0).all()  # yflip off by default
    # p=0.25: most images keep most transforms off
    l = np.asarray(sample_augment_labels(jax.random.PRNGKey(4), 256, 0.25))
    assert ((l[:, 2] != 0).mean()) < 0.5


@pytest.mark.slow  # 53 s warm: two full EDM net applies with/without hook
def test_network_hook_none_equals_zero_descriptor():
    from diffusion_model_nemo_tpu.modules import DiT, Unet

    for net, x in (
        (Unet(dim=8, dim_mults=[1, 2], channels=1, aug_dim=AUGMENT_DIM),
         jnp.zeros((2, 8, 8, 1))),
        (DiT(dim=32, depth=1, heads=2, patch_size=2, channels=1, aug_dim=AUGMENT_DIM),
         jnp.zeros((2, 8, 8, 1))),
    ):
        t = jnp.zeros((2,))
        params = net.init(jax.random.PRNGKey(0), x, t)["params"]
        a = net.apply({"params": params}, x, t, aug_cond=None)
        b = net.apply({"params": params}, x, t, aug_cond=jnp.zeros((2, AUGMENT_DIM)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # zero-init: any descriptor is a no-op until the kernel trains
        c = net.apply({"params": params}, x, t, aug_cond=jnp.ones((2, AUGMENT_DIM)))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # a trained (non-zero) net makes the descriptor matter (DiT is
        # adaLN-Zero: EVERY path from the conditioning is zero-init, so kick
        # all params, not just aug_embed)
        kicked = jax.tree.map(lambda p: p + 0.02, params)
        d = net.apply({"params": kicked}, x, t, aug_cond=jnp.ones((2, AUGMENT_DIM)))
        e = net.apply({"params": kicked}, x, t, aug_cond=None)
        assert not np.allclose(np.asarray(d), np.asarray(e))


def _edm(aug_net=False, **model_over):
    from diffusion_model_nemo_tpu.models import EDM
    from tests.test_edm import _tiny_cfg

    cfg = _tiny_cfg()
    if aug_net:
        cfg["diffusion_model"]["aug_dim"] = AUGMENT_DIM
    cfg.update(model_over)
    m = EDM(cfg=cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def _batch(B=8):
    rng = np.random.default_rng(1)
    return {
        "image": rng.integers(0, 255, (B, 8, 8, 1), dtype=np.uint8),
        "label": np.zeros((B,), np.int32),
    }


@pytest.mark.slow  # 55 s warm: two full EDM train programs, bitwise compare
def test_edm_augment_prob_zero_is_bitwise_baseline():
    plain = _edm()
    cfg_off = _edm(augment_prob=0.0)
    batch, key = _batch(), jax.random.PRNGKey(5)
    l1, _ = plain.training_step(plain.params, batch, key, 0)
    l2, _ = cfg_off.training_step(cfg_off.params, batch, key, 0)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_edm_augmented_training_runs_and_spies():
    m = _edm(aug_net=True, augment_prob=0.7)

    seen = []
    orig = m.model_fn

    def spy(params, x, t, classes=None, dropout_rng=None, aug_cond=None):
        seen.append(None if aug_cond is None else np.asarray(aug_cond))
        return orig(params, x, t, classes=classes, dropout_rng=dropout_rng,
                    aug_cond=aug_cond)

    m.model_fn = spy
    batch, key = _batch(), jax.random.PRNGKey(5)
    loss, _ = m.training_step(m.params, batch, key, 0)
    assert np.isfinite(float(loss))
    assert seen and seen[-1] is not None and (np.abs(seen[-1]) > 0).any()

    seen.clear()
    m.sample(batch_size=2, image_size=8, key=jax.random.PRNGKey(1))
    assert seen and all(s is None for s in seen)  # zeros-convention at sampling

    # same key, augmentation off -> different loss than on (the pipe acted)
    m2 = _edm(aug_net=True, augment_prob=0.0)
    l2, _ = m2.training_step(m.params, batch, key, 0)
    assert float(loss) != float(l2)


def test_edm_augment_misconfiguration_fails_loudly():
    with pytest.raises(ValueError, match="aug_dim"):
        _edm(augment_prob=0.3)
