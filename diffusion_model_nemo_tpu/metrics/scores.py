"""Inception Score and Kernel Inception Distance — companions to FID.

The reference ships no sample-quality metrics at all (SURVEY §6); the
framework's eval suite covers the three standard generative-image scores:

- FID (metrics/fid.py) — Gaussian 2-Wasserstein on pool3 features.
- Inception Score (Salimans et al. 2016) — exp(E_x KL(p(y|x) || p(y))) over
  classifier posteriors; needs the extractor's logits head
  (``inception_feature_fn(with_logits=True)``).
- KID (Binkowski et al. 2018, "Demystifying MMD GANs") — unbiased MMD² with
  the cubic polynomial kernel k(x, y) = (x·y/d + 1)³ on pool3 features.
  Unlike FID it is unbiased in the sample count, so it is the
  recommended score when only a few hundred samples are affordable.

All functions are host-side numpy (feature sets are small — [N, 2048]);
feature extraction itself is the jitted on-device part.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["inception_score", "kernel_inception_distance", "polynomial_kernel"]


def inception_score(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS over classifier posteriors ``probs`` [N, K] (rows sum to 1).

    Returns (mean, std) across ``splits`` contiguous chunks — the original
    paper's protocol. IS = exp(mean_x KL(p(y|x) || p(y))), computed per
    chunk with that chunk's marginal.
    """
    p = np.asarray(probs, dtype=np.float64)
    if p.ndim != 2 or p.shape[0] < splits:
        raise ValueError(f"probs must be [N>=splits, K], got {p.shape}")
    eps = 1e-16
    scores = []
    for chunk in np.array_split(p, splits, axis=0):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + eps) - np.log(marginal + eps))).sum(axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def polynomial_kernel(x: np.ndarray, y: np.ndarray, degree: int = 3,
                      gamma: Optional[float] = None, coef0: float = 1.0) -> np.ndarray:
    """k(x, y) = (gamma * x·y + coef0)^degree, gamma defaulting to 1/D —
    the KID paper's kernel. x [N, D], y [M, D] → [N, M]."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def _mmd2_unbiased(kxx: np.ndarray, kyy: np.ndarray, kxy: np.ndarray) -> float:
    """Unbiased MMD² estimate from kernel matrices (diagonal excluded)."""
    n = kxx.shape[0]
    m = kyy.shape[0]
    sum_xx = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2.0 * sum_xy)


def kernel_inception_distance(
    real_features: np.ndarray,
    fake_features: np.ndarray,
    subset_size: Optional[int] = None,
    n_subsets: int = 100,
    degree: int = 3,
    seed: int = 0,
) -> Tuple[float, float]:
    """KID between two feature sets [N, D] / [M, D].

    Block estimator: ``n_subsets`` random subsets of ``subset_size`` rows
    each (drawn without replacement per subset), unbiased MMD² per subset,
    mean ± std reported — the protocol of the KID paper's reference code.
    ``subset_size`` defaults to min(N, M, 1000).
    """
    x = np.asarray(real_features, dtype=np.float64)
    y = np.asarray(fake_features, dtype=np.float64)
    if x.ndim != 2 or y.ndim != 2 or x.shape[1] != y.shape[1]:
        raise ValueError(f"feature shapes mismatch: {x.shape} vs {y.shape}")
    m = min(x.shape[0], y.shape[0], subset_size or 1000)
    if m < 2:
        raise ValueError("KID needs at least 2 samples per set")
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n_subsets):
        xi = x[rng.choice(x.shape[0], m, replace=False)]
        yi = y[rng.choice(y.shape[0], m, replace=False)]
        kxx = polynomial_kernel(xi, xi, degree=degree)
        kyy = polynomial_kernel(yi, yi, degree=degree)
        kxy = polynomial_kernel(xi, yi, degree=degree)
        vals.append(_mmd2_unbiased(kxx, kyy, kxy))
    return float(np.mean(vals)), float(np.std(vals))
