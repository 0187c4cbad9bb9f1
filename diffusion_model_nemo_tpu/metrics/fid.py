"""Fréchet distance (FID) machinery — feature-extractor agnostic.

The reference computes no FID anywhere (SURVEY §6: grep for fid/frechet is
empty); the north-star requires FID *parity measurement*, so the framework
ships the metric machinery:

- :func:`frechet_distance` — the closed-form 2-Wasserstein distance between
  Gaussians fitted to two feature sets (Heusel et al. 2017), with a stable
  eigenvalue-based sqrtm (no scipy needed on device).
- :func:`compute_statistics` — streaming mean/covariance over feature batches.
- :class:`FIDScorer` — accumulates real/generated features from any
  ``feature_fn(images_uint8) -> [B, D]`` extractor. Standard FID plugs an
  InceptionV3-pool3 extractor into ``feature_fn`` (weights are not bundled —
  this environment has no network egress); any fixed embedding yields a
  consistent relative score for regression tracking.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["frechet_distance", "compute_statistics", "FIDScorer"]


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean [D] and covariance [D, D] of features [N, D] (float64)."""
    feats = np.asarray(features, dtype=np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_product(sigma1: np.ndarray, sigma2: np.ndarray, eps: float = 1e-10) -> float:
    """tr(sqrtm(Σ1 Σ2)) via the symmetric-eigendecomposition identity:
    with A = Σ1^{1/2}, tr√(Σ1Σ2) = tr√(A Σ2 A) and A Σ2 A is PSD."""
    vals1, vecs1 = np.linalg.eigh(sigma1)
    vals1 = np.clip(vals1, 0.0, None)
    sqrt1 = (vecs1 * np.sqrt(vals1)) @ vecs1.T
    inner = sqrt1 @ sigma2 @ sqrt1
    vals = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    return float(np.sqrt(np.clip(vals, 0.0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID = ‖μ1−μ2‖² + tr(Σ1 + Σ2 − 2√(Σ1Σ2))."""
    diff = np.asarray(mu1, np.float64) - np.asarray(mu2, np.float64)
    covmean_trace = _sqrtm_product(np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * covmean_trace)


def default_feature_fn(images: np.ndarray) -> np.ndarray:
    """Weight-free fallback features: downsampled pixels + channelwise
    moments. Fine for regression tracking; NOT comparable to Inception FID."""
    x = np.asarray(images, dtype=np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    B, H, W, C = x.shape
    stride = max(H // 8, 1)
    pooled = x[:, ::stride, ::stride, :].reshape(B, -1)
    mean = x.reshape(B, -1, C).mean(axis=1)
    std = x.reshape(B, -1, C).std(axis=1)
    return np.concatenate([pooled, mean, std], axis=1)


class FIDScorer:
    def __init__(self, feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None):
        self.feature_fn = feature_fn or default_feature_fn
        self._real = []
        self._fake = []

    def update_real(self, images: np.ndarray) -> None:
        self._real.append(np.asarray(self.feature_fn(images)))

    def update_generated(self, images: np.ndarray) -> None:
        self._fake.append(np.asarray(self.feature_fn(images)))

    def update_real_features(self, features: np.ndarray) -> None:
        """Accumulate pre-extracted features (e.g. from the combined
        features+probs extractor, which runs the trunk once per image)."""
        self._real.append(np.asarray(features))

    def update_generated_features(self, features: np.ndarray) -> None:
        self._fake.append(np.asarray(features))

    def compute(self) -> float:
        if not self._real or not self._fake:
            raise ValueError("Need both real and generated features")
        mu_r, sig_r = compute_statistics(np.concatenate(self._real))
        mu_f, sig_f = compute_statistics(np.concatenate(self._fake))
        return frechet_distance(mu_r, sig_r, mu_f, sig_f)

    def compute_kid(self, subset_size=None, n_subsets: int = 100, seed: int = 0):
        """KID (mean, std) over the accumulated feature sets — the unbiased
        companion metric for small sample counts (metrics/scores.py)."""
        from .scores import kernel_inception_distance

        if not self._real or not self._fake:
            raise ValueError("Need both real and generated features")
        return kernel_inception_distance(
            np.concatenate(self._real), np.concatenate(self._fake),
            subset_size=subset_size, n_subsets=n_subsets, seed=seed,
        )

    def reset(self) -> None:
        self._real.clear()
        self._fake.clear()
