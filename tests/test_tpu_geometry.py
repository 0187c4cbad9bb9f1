"""Opt-in TPU-geometry fast path (``diffusion_model.tpu_geometry: s2d``).

The parity path (``off``, the default) is untouched: these tests pin that the
flag changes only the model geometry, that the s2d model trains and samples at
the same public shapes as the parity model, and that space_to_depth /
depth_to_space are exact inverses (the rearrangement itself is bitwise).

The s2d variant is a DIFFERENT architecture (stem input channels ×4, all
levels at half spatial resolution) sanctioned as an opt-in throughput path —
it must be trained with the flag on; there is no weight transplant from the
parity model (documented in modules/unet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules.unet import (
    Unet,
    WaveGradUNet,
    depth_to_space,
    space_to_depth,
)


def test_s2d_d2s_roundtrip_exact():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 12, 5), jnp.float32)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 6, 20)
    back = depth_to_space(y, 2)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_s2d_channel_order_keeps_channel_splits():
    # A channel-split of a depth_to_space result must see ordinary [B,H,W,C]
    # halves (the learned-variance (eps, v) chunk relies on this).
    B, h, w, C = 1, 2, 2, 6
    x = jnp.arange(B * h * w * 4 * C, dtype=jnp.float32).reshape(B, h, w, 4 * C)
    out = depth_to_space(x, 2)
    assert out.shape == (B, 4, 4, C)
    # sub-pixel (0,0) of coarse pixel (0,0) carries channels 0..C-1 contiguously
    assert np.array_equal(np.asarray(out[0, 0, 0]), np.arange(C, dtype=np.float32))
    # sub-pixel (0,1) carries the next C channels
    assert np.array_equal(
        np.asarray(out[0, 0, 1]), np.arange(C, 2 * C, dtype=np.float32)
    )


def test_unet_s2d_shapes_match_parity():
    net = Unet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False,
               tpu_geometry="s2d")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    out = net.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == jnp.float32
    # Stem consumes 4x channels; final conv emits 4x out_dim.
    assert params["init_conv"]["kernel"].shape == (7, 7, 12, 16)
    assert params["final_conv"]["kernel"].shape[-1] == 12


def test_unet_s2d_learned_variance_split():
    net = Unet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False,
               learned_variance=True, tpu_geometry="s2d")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    out = net.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 6)
    eps, v = jnp.split(out, 2, axis=-1)
    assert eps.shape == v.shape == (2, 16, 16, 3)


def test_unet_geometry_off_is_default_and_unchanged():
    a = Unet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False)
    b = Unet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False,
             tpu_geometry="off")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    pa = a.init(jax.random.PRNGKey(0), x, t)["params"]
    pb = b.init(jax.random.PRNGKey(0), x, t)["params"]
    assert pa["init_conv"]["kernel"].shape == (7, 7, 3, 16)
    oa = a.apply({"params": pa}, x, t)
    ob = b.apply({"params": pb}, x, t)
    assert np.array_equal(np.asarray(oa), np.asarray(ob))


def test_unet_s2d_hybrid_shapes():
    # Hybrid: body at half resolution, final block at full resolution.
    net = Unet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False,
               resnet_block_groups=4, tpu_geometry="s2d_hybrid")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    out = net.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 3)
    # stem still sees 4x channels; final conv is back to plain out_dim
    assert params["init_conv"]["kernel"].shape == (7, 7, 12, 16)
    assert params["final_conv"]["kernel"].shape[-1] == 3
    # final block consumes the depth-to-spaced dim/(r*r) = 4 channels
    block1 = params["final_block"]["block1"]
    conv_kernels = [v["kernel"] for k, v in block1.items() if "kernel" in v]
    assert any(k.shape[-2] == 4 for k in conv_kernels)


@pytest.mark.slow  # 65 s: flagship-geometry hybrid train + 2 sampler compiles
def test_flagship_s2d_hybrid_train_and_sample():
    from __graft_entry__ import _flagship

    model = _flagship(image_size=16, dim=16, dim_mults=(1, 2), timesteps=8,
                      dtype="float32", tpu_geometry="s2d_hybrid")
    model.init_params(jax.random.PRNGKey(0))
    params = model.params
    batch = {
        "image": np.random.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8),
        "label": np.zeros((4,), np.int32),
    }
    (loss, _), _ = jax.value_and_grad(model.training_step, has_aux=True)(
        params, batch, jax.random.PRNGKey(1), 0
    )
    assert np.isfinite(float(loss))
    net = model.diffusion_model

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    out = model.sampler.p_sample_loop(
        model_fn, params, (2, 16, 16, 3), jax.random.PRNGKey(2)
    )
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_geometry_invalid_raises():
    net = Unet(dim=16, dim_mults=(1, 2), tpu_geometry="nope")
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    with pytest.raises(ValueError, match="tpu_geometry"):
        net.init(jax.random.PRNGKey(0), x, t)


def test_wavegrad_unet_s2d():
    net = WaveGradUNet(dim=16, dim_mults=(1, 2), channels=3, use_convnext=False,
                       tpu_geometry="s2d")
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    level = jnp.full((2, 1, 1, 1), 0.7, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, level)["params"]
    out = net.apply({"params": params}, x, level)
    assert out.shape == (2, 16, 16, 3)


@pytest.mark.slow  # 45 s warm: s2d flagship train + 2 sampler compiles
def test_flagship_s2d_train_and_sample():
    """The config-plumbed s2d flagship runs a train step and the fused
    sampling scan at the public CIFAR shapes."""
    from __graft_entry__ import _flagship

    model = _flagship(image_size=16, dim=16, dim_mults=(1, 2), timesteps=8,
                      dtype="float32", tpu_geometry="s2d")
    model.init_params(jax.random.PRNGKey(0))
    params = model.params

    batch = {
        "image": np.random.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8),
        "label": np.zeros((4,), np.int32),
    }
    (loss, _), grads = jax.value_and_grad(model.training_step, has_aux=True)(
        params, batch, jax.random.PRNGKey(1), 0
    )
    assert np.isfinite(float(loss))
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0
    ))
    assert np.isfinite(gnorm) and gnorm > 0.0

    net = model.diffusion_model

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    out = model.sampler.p_sample_loop(
        model_fn, params, (2, 16, 16, 3), jax.random.PRNGKey(2)
    )
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))
