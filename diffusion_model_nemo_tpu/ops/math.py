"""Numerics helpers shared by losses and likelihood evaluation.

JAX equivalents of the reference's diffusion_model_nemo/utils.py:10-65
(``normal_kl``, ``approx_standard_normal_cdf``,
``discretized_gaussian_log_likelihood``, ``mean_flattened``, ``log``,
``num_to_groups``). All functions are pure and jit/vmap-safe.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp

__all__ = [
    "log",
    "mean_flattened",
    "sum_flattened",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "num_to_groups",
    "LOG2",
]

LOG2 = math.log(2.0)


def log(t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Numerically-safe log: clamps input at ``eps`` (reference utils.py:14-15)."""
    return jnp.log(jnp.clip(t, min=eps))


def mean_flattened(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes → shape ``[B]`` (reference utils.py:24-25)."""
    return x.mean(axis=tuple(range(1, x.ndim)))


def sum_flattened(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over all non-batch axes → shape ``[B]``."""
    return x.sum(axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), elementwise.

    Matches reference utils.py:28-34.
    """
    mean1 = jnp.asarray(mean1)
    logvar1 = jnp.asarray(logvar1)
    mean2 = jnp.asarray(mean2)
    logvar2 = jnp.asarray(logvar2)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh approximation of the standard normal CDF (reference utils.py:37-38)."""
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * (x**3))))


def discretized_gaussian_log_likelihood(
    x: jnp.ndarray, *, means: jnp.ndarray, log_scales: jnp.ndarray, thres: float = 0.999
) -> jnp.ndarray:
    """Log-likelihood of a Gaussian discretized to 8-bit bins of width 2/255.

    Elementwise, for images scaled to [-1, 1]; matches reference
    utils.py:41-56 including the tail-bin handling at |x| > thres.
    """
    assert x.shape == means.shape == log_scales.shape
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = log(cdf_plus)
    log_one_minus_cdf_min = log(1.0 - cdf_min)
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -thres,
        log_cdf_plus,
        jnp.where(x > thres, log_one_minus_cdf_min, log(cdf_delta)),
    )


def num_to_groups(num: int, divisor: int) -> List[int]:
    """Split ``num`` into chunks of at most ``divisor`` (reference utils.py:59-65)."""
    groups = num // divisor
    remainder = num % divisor
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr
