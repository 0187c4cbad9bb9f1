"""Fused-op kernels (XLA-fallback path on CPU) vs reference formulas.

On TPU the same entry points dispatch Pallas kernels, verified separately on
hardware; these tests pin the semantics + gradients of the public ops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from diffusion_model_nemo_tpu.ops.attention import attention_reference, fused_attention
from diffusion_model_nemo_tpu.ops.norm import group_norm_silu, group_norm_silu_reference


def test_group_norm_silu_matches_torch():
    """Our GroupNorm numerics must match torch.nn.GroupNorm + SiLU exactly
    (the reference net's building block)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 16).astype(np.float32)
    gamma = rng.randn(16).astype(np.float32)
    beta = rng.randn(16).astype(np.float32)

    ours = np.asarray(group_norm_silu(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 4))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    gn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
        expected = torch.nn.functional.silu(gn(tx)).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_group_norm_silu_film():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))
    scale = jnp.asarray(rng.randn(2, 1, 1, 8).astype(np.float32))
    shift = jnp.asarray(rng.randn(2, 1, 1, 8).astype(np.float32))
    out = group_norm_silu(x, gamma, beta, 2, scale_shift=(scale, shift))
    ref = group_norm_silu_reference(x, gamma, beta, 2, scale=scale, shift=shift)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_group_norm_silu_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))
    g1 = jax.grad(lambda x: group_norm_silu(x, gamma, beta, 2).sum())(x)
    g2 = jax.grad(lambda x: group_norm_silu_reference(x, gamma, beta, 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_fused_attention_matches_reference_and_torch():
    rng = np.random.RandomState(3)
    B, N, h, d = 2, 9, 4, 8
    q = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32)) * d**-0.5
    k = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32))
    out = fused_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # vs torch softmax attention
    tq, tk, tv = (torch.from_numpy(np.asarray(a)).permute(0, 2, 1, 3) for a in (q, k, v))
    expected = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, scale=1.0)
    expected = expected.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_fused_attention_gradients():
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    g1 = jax.grad(lambda q: fused_attention(q, k, v).sum())(q)
    g2 = jax.grad(lambda q: attention_reference(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
