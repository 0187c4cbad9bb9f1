"""FID machinery tests (closed-form properties)."""

import numpy as np
import pytest

from diffusion_model_nemo_tpu.metrics import (
    FIDScorer,
    compute_statistics,
    frechet_distance,
)


def test_frechet_identical_distributions_zero():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 8)
    mu, sig = compute_statistics(feats)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift_closed_form():
    """For equal covariances, FID = ||mu1 - mu2||^2."""
    rng = np.random.RandomState(1)
    d = 4
    sigma = np.eye(d)
    mu1 = np.zeros(d)
    mu2 = np.full(d, 2.0)
    assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(d * 4.0, rel=1e-6)


def test_frechet_isotropic_variance_closed_form():
    """For mu1=mu2=0, Σ1=aI, Σ2=bI: FID = d(√a − √b)²."""
    d = 3
    a, b = 4.0, 1.0
    fid = frechet_distance(np.zeros(d), a * np.eye(d), np.zeros(d), b * np.eye(d))
    assert fid == pytest.approx(d * (2.0 - 1.0) ** 2, rel=1e-6)


def test_fid_scorer_detects_distribution_shift():
    rng = np.random.RandomState(2)
    real = rng.randint(100, 156, size=(128, 8, 8, 1)).astype(np.uint8)
    same = rng.randint(100, 156, size=(128, 8, 8, 1)).astype(np.uint8)
    shifted = rng.randint(0, 56, size=(128, 8, 8, 1)).astype(np.uint8)

    s1 = FIDScorer()
    s1.update_real(real)
    s1.update_generated(same)
    near = s1.compute()

    s2 = FIDScorer()
    s2.update_real(real)
    s2.update_generated(shifted)
    far = s2.compute()

    assert far > near * 5
