"""Inception Score + KID (metrics/scores.py) and the extractor's fc head.

The reference ships no sample-quality metrics (SURVEY §6); these pin the
framework's IS/KID math against closed forms and an independent in-test MMD
implementation, and the classifier head against a transplanted torch Linear.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.metrics import (
    FIDScorer,
    inception_score,
    kernel_inception_distance,
    polynomial_kernel,
)


# ------------------------------------------------------------ Inception Score
def test_is_uniform_posteriors_is_one():
    """p(y|x) = p(y) for every x → KL = 0 → IS = 1 exactly."""
    probs = np.full((100, 10), 0.1)
    mean, std = inception_score(probs, splits=5)
    assert abs(mean - 1.0) < 1e-9
    assert std < 1e-9


def test_is_confident_balanced_posteriors_is_num_classes():
    """One-hot posteriors uniformly covering K classes → IS = K (the
    theoretical maximum)."""
    K = 7
    labels = np.tile(np.arange(K), 21)  # 147 rows, balanced within chunks
    probs = np.eye(K)[labels]
    mean, _ = inception_score(probs, splits=3)
    assert abs(mean - K) < 1e-6


def test_is_between_extremes_for_partial_confidence():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(200, 10)) * 2.0
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    mean, _ = inception_score(probs, splits=4)
    assert 1.0 < mean < 10.0


def test_is_rejects_bad_shapes():
    with pytest.raises(ValueError):
        inception_score(np.ones((3, 10)), splits=5)


# ----------------------------------------------------------------------- KID
def test_kid_matches_independent_mmd_formula():
    """Single full-set subset vs a from-scratch unbiased MMD² written inline
    (different code path: explicit double loops over the kernel sums)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(12, 6))
    y = rng.normal(loc=0.5, size=(12, 6))
    got, _ = kernel_inception_distance(x, y, subset_size=12, n_subsets=1, seed=0)

    d = x.shape[1]
    k = lambda a, b: (a @ b / d + 1.0) ** 3
    n = len(x)
    sxx = sum(k(x[i], x[j]) for i in range(n) for j in range(n) if i != j) / (n * (n - 1))
    syy = sum(k(y[i], y[j]) for i in range(n) for j in range(n) if i != j) / (n * (n - 1))
    sxy = sum(k(x[i], y[j]) for i in range(n) for j in range(n)) / (n * n)
    assert abs(got - (sxx + syy - 2 * sxy)) < 1e-10


def test_kid_near_zero_same_distribution_positive_when_shifted():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(400, 16))
    same = rng.normal(size=(400, 16))
    far = rng.normal(loc=1.0, size=(400, 16))
    kid_same, _ = kernel_inception_distance(real, same, subset_size=100, n_subsets=20)
    kid_far, _ = kernel_inception_distance(real, far, subset_size=100, n_subsets=20)
    assert abs(kid_same) < 0.05  # unbiased: hovers around 0, may dip negative
    assert kid_far > 10 * max(abs(kid_same), 1e-6)


def test_polynomial_kernel_default_gamma():
    x = np.ones((2, 4))
    k = polynomial_kernel(x, x)
    np.testing.assert_allclose(k, np.full((2, 2), 8.0))  # (4/4 + 1)^3


def test_fidscorer_kid_and_feature_updates():
    rng = np.random.default_rng(3)
    scorer = FIDScorer(feature_fn=None)
    scorer.update_real_features(rng.normal(size=(50, 8)))
    scorer.update_generated_features(rng.normal(loc=2.0, size=(50, 8)))
    fid = scorer.compute()
    kid, kid_std = scorer.compute_kid(n_subsets=10)
    assert fid > 0 and kid > 0 and kid_std >= 0


# ------------------------------------------------- extractor classifier head
def test_fc_head_matches_transplanted_torch_linear():
    """The IS path's Dense head must reproduce torch's fc on the same pool3
    features (weight mapping is a pure [out,in]→[in,out] transpose)."""
    import torch

    from diffusion_model_nemo_tpu.metrics.inception import (
        torch_state_dict_to_flax,
    )

    torch.manual_seed(0)
    lin = torch.nn.Linear(32, 11)
    feats = torch.randn(5, 32)
    want = lin(feats).detach().numpy()

    sd = {f"fc.{k}": v.detach().numpy() for k, v in lin.state_dict().items()}
    variables = torch_state_dict_to_flax(sd, keep_fc=True)
    import flax.linen as nn

    got = nn.Dense(11, name="fc").apply(
        {"params": variables["params"]["fc"]}, jnp.asarray(feats.numpy())
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_with_logits_extractor_consistent_with_plain():
    """Same seeded random trunk: with_logits returns identical pool3 features
    plus a well-formed posterior (rows sum to 1)."""
    from diffusion_model_nemo_tpu.metrics import inception_feature_fn

    imgs = np.random.default_rng(4).integers(0, 255, (2, 32, 32, 3), np.uint8)
    plain = inception_feature_fn(batch_size=2)
    both = inception_feature_fn(batch_size=2, with_logits=True)
    f0 = plain(imgs)
    f1, probs = both(imgs)
    np.testing.assert_allclose(f0, f1, rtol=1e-5, atol=1e-5)
    assert probs.shape == (2, 1000)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    assert both.num_logits == 1000
