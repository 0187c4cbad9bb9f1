"""U-Net shape/option tests (topology parity with reference unet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.modules import Unet, WaveGradUNet


def _init_and_run(net, x, t, **kw):
    params = net.init(jax.random.PRNGKey(0), x, t, **kw)["params"]
    return params, net.apply({"params": params}, x, t, **kw)


def test_unet_output_shape_resnet():
    net = Unet(dim=8, dim_mults=[1, 2], channels=3, use_convnext=False, resnet_block_groups=4)
    x = jnp.zeros((2, 16, 16, 3))
    _, out = _init_and_run(net, x, jnp.array([0, 5]))
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == jnp.float32


def test_unet_output_shape_convnext():
    net = Unet(dim=8, dim_mults=[1, 2, 4], channels=1, use_convnext=True)
    x = jnp.zeros((2, 16, 16, 1))
    _, out = _init_and_run(net, x, jnp.array([0, 5]))
    assert out.shape == (2, 16, 16, 1)


def test_learned_variance_doubles_channels():
    net = Unet(dim=8, dim_mults=[1, 2], channels=3, learned_variance=True, use_convnext=False)
    x = jnp.zeros((1, 8, 8, 3))
    _, out = _init_and_run(net, x, jnp.array([0]))
    assert out.shape == (1, 8, 8, 6)


def test_out_dim_override():
    net = Unet(dim=8, dim_mults=[1, 2], channels=3, out_dim=5, use_convnext=False)
    x = jnp.zeros((1, 8, 8, 3))
    _, out = _init_and_run(net, x, jnp.array([0]))
    assert out.shape == (1, 8, 8, 5)


def test_class_conditioning_null_class_is_noop():
    """The null class (index == num_classes) embeds to zero, so output equals
    classes=None (torch padding_idx parity)."""
    net = Unet(dim=8, dim_mults=[1, 2], channels=1, num_classes=4, use_convnext=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.array([1, 2])
    params = net.init(jax.random.PRNGKey(0), x, t, classes=jnp.array([0, 1]))["params"]
    out_null = net.apply({"params": params}, x, t, classes=jnp.array([4, 4]))
    out_none = net.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_none), atol=1e-6)
    # a real class must change the output
    out_c0 = net.apply({"params": params}, x, t, classes=jnp.array([0, 0]))
    assert np.abs(np.asarray(out_c0) - np.asarray(out_none)).max() > 1e-6


def test_time_embedding_affects_output():
    net = Unet(dim=8, dim_mults=[1, 2], channels=1, use_convnext=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x, jnp.array([0]))["params"]
    o1 = net.apply({"params": params}, x, jnp.array([0]))
    o2 = net.apply({"params": params}, x, jnp.array([999]))
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_bfloat16_compute_dtype():
    net = Unet(dim=8, dim_mults=[1, 2], channels=1, use_convnext=False, dtype="bfloat16")
    x = jnp.zeros((1, 8, 8, 1))
    params, out = _init_and_run(net, x, jnp.array([0]))
    # params stay float32; output is cast back to float32
    assert jax.tree.leaves(params)[0].dtype == jnp.float32
    assert out.dtype == jnp.float32


def test_wavegrad_unet_film_path():
    net = WaveGradUNet(dim=8, dim_mults=[1, 2], channels=1, use_convnext=False)
    x = jnp.zeros((2, 8, 8, 1))
    level = jnp.full((2, 1, 1, 1), 0.7)
    params = net.init(jax.random.PRNGKey(0), x, level)["params"]
    out = net.apply({"params": params}, x, level)
    assert out.shape == (2, 8, 8, 1)
    # noise level must modulate the output via FiLM
    out2 = net.apply({"params": params}, x, jnp.full((2, 1, 1, 1), 0.1))
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
    # no unused up-path FiLM parameters (reference creates dead modules)
    film_names = [k for k in params if k.startswith("film_")]
    assert len(film_names) == 1 + 2  # stem + one per down level
