"""PSNR/SSIM metrics (metrics/image_quality.py).

Anchors: identity images score SSIM 1 / huge PSNR; constant-vs-constant SSIM
has a closed form ((2 m1 m2 + C1)/(m1^2 + m2^2 + C1) — the structure/contrast
factor is exactly 1 when both variances vanish); an independent numpy
implementation (explicit sliding windows, no conv) matches on random images;
standard metric orderings (noise monotonicity, PSNR/MSE relationship).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.metrics import psnr, ssim


def _np_ssim(a, b, max_val=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent reference: explicit window loops over valid positions."""
    g = np.exp(-0.5 * ((np.arange(size) - (size - 1) / 2.0) / sigma) ** 2)
    g /= g.sum()
    w = np.outer(g, g)
    B, H, W, C = a.shape
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    out = np.zeros(B)
    for n in range(B):
        vals = []
        for c in range(C):
            for i in range(H - size + 1):
                for j in range(W - size + 1):
                    pa = a[n, i : i + size, j : j + size, c]
                    pb = b[n, i : i + size, j : j + size, c]
                    mu_a = (w * pa).sum()
                    mu_b = (w * pb).sum()
                    va = (w * pa * pa).sum() - mu_a**2
                    vb = (w * pb * pb).sum() - mu_b**2
                    cov = (w * pa * pb).sum() - mu_a * mu_b
                    vals.append(
                        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
                    )
        out[n] = np.mean(vals)
    return out


def test_identity_scores():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)
    assert (np.asarray(psnr(x, x)) > 100).all()


def test_constant_images_closed_form():
    m1, m2 = 0.3, 0.7
    a = jnp.full((1, 12, 12, 1), m1)
    b = jnp.full((1, 12, 12, 1), m2)
    c1 = 0.01**2
    expect = (2 * m1 * m2 + c1) / (m1**2 + m2**2 + c1)
    np.testing.assert_allclose(np.asarray(ssim(a, b))[0], expect, rtol=1e-4)
    # PSNR closed form: MSE = (m1 - m2)^2
    np.testing.assert_allclose(
        np.asarray(psnr(a, b))[0], 10 * np.log10(1.0 / (m1 - m2) ** 2), rtol=1e-4
    )


def test_matches_independent_numpy_implementation():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 13, 14, 2)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _np_ssim(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_noise_monotonicity_and_validation():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.2, 0.8, (1, 16, 16, 1)).astype(np.float32)
    s = [
        float(ssim(jnp.asarray(x), jnp.asarray(np.clip(x + rng.normal(0, lvl, x.shape), 0, 1).astype(np.float32)))[0])
        for lvl in (0.02, 0.1, 0.3)
    ]
    assert s[0] > s[1] > s[2]
    with pytest.raises(ValueError):
        ssim(jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 8, 8, 1)))  # smaller than window
    with pytest.raises(ValueError):
        ssim(jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 12, 1)))


def test_jittable_and_batched():
    f = jax.jit(ssim)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 3))
    y = jax.random.uniform(jax.random.PRNGKey(4), (4, 16, 16, 3))
    out = np.asarray(f(x, y))
    assert out.shape == (4,)
    assert np.isfinite(out).all() and (out <= 1.0).all()
