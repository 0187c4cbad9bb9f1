"""Beta schedules and the precomputed diffusion constant table.

TPU-native redesign of the reference's schedule + constant machinery
(reference: diffusion_model_nemo/modules/diffusion_process.py:8-36 for the four
beta schedules, diffusion_model_nemo/modules/gaussian_diffusion.py:44-83 for the
constant table). Instead of mutable module attributes populated by
``compute_constants``, everything here is a pure function returning an immutable
pytree of ``[T]`` float32 arrays that lives in HBM and is closed over by jitted
sampling/training code. ``extract`` becomes a fused gather + broadcast reshape
with no host round-trip (the reference gathers on CPU per call,
diffusion_process.py:84-87).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "cosine_beta_schedule",
    "linear_beta_schedule",
    "quadratic_beta_schedule",
    "sigmoid_beta_schedule",
    "get_named_beta_schedule",
    "rescale_zero_terminal_snr",
    "ScheduleConstants",
    "compute_schedule_constants",
    "extract",
    "SCHEDULE_NAMES",
    "CosineSchedule",
    "LinearSchedule",
    "QuadraticSchedule",
    "SigmoidSchedule",
]

SCHEDULE_NAMES = ("linear", "quadratic", "sigmoid", "cosine")


def cosine_beta_schedule(
    timesteps: int, s: float = 0.008, min_clip: float = 0.0001, max_clip: float = 0.999
) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (https://arxiv.org/abs/2102.09672).

    Matches reference diffusion_process.py:8-17 (betas clipped to
    ``[min_clip, max_clip]``). Computed on host in float64 and cast to float32.
    """
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, min_clip, max_clip).astype(np.float32)


def linear_beta_schedule(
    timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02
) -> np.ndarray:
    """Linear schedule (Ho et al. 2020); reference diffusion_process.py:20-23."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64).astype(np.float32)


def quadratic_beta_schedule(
    timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02
) -> np.ndarray:
    """Quadratic schedule; reference diffusion_process.py:26-29."""
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
    ).astype(np.float32)


def sigmoid_beta_schedule(
    timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02
) -> np.ndarray:
    """Sigmoid schedule; reference diffusion_process.py:32-36."""
    x = np.linspace(-6, 6, timesteps, dtype=np.float64)
    betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    return betas.astype(np.float32)


_SCHEDULE_FNS = {
    "cosine": cosine_beta_schedule,
    "linear": linear_beta_schedule,
    "quadratic": quadratic_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}

# Structured schedule-override configs mirroring the reference dataclasses
# (diffusion_process.py:94-116) so YAML `schedule_cfg` blocks round-trip.


def CosineSchedule(s: float = 0.008, min_clip: float = 0.0001, max_clip: float = 0.999) -> dict:
    return {"s": s, "min_clip": min_clip, "max_clip": max_clip}


def LinearSchedule(beta_start: float = 0.0001, beta_end: float = 0.02) -> dict:
    return {"beta_start": beta_start, "beta_end": beta_end}


def QuadraticSchedule(beta_start: float = 0.0001, beta_end: float = 0.02) -> dict:
    return {"beta_start": beta_start, "beta_end": beta_end}


def SigmoidSchedule(beta_start: float = 0.0001, beta_end: float = 0.02) -> dict:
    return {"beta_start": beta_start, "beta_end": beta_end}


def get_named_beta_schedule(
    schedule_name: str, timesteps: int, schedule_cfg: Optional[Dict[str, Any]] = None
) -> np.ndarray:
    """Resolve a schedule by name with optional per-schedule kwargs.

    ``schedule_cfg`` follows the reference YAML layout: a dict keyed by schedule
    name whose value holds that schedule's kwargs
    (examples/configs/ddpm/unet_small.yaml:46-58), or directly a kwargs dict.
    """
    if schedule_name not in _SCHEDULE_FNS:
        raise ValueError(
            f"Invalid schedule `{schedule_name}`; must be one of {sorted(_SCHEDULE_FNS)}"
        )
    kwargs: Dict[str, Any] = {}
    if schedule_cfg:
        # Accept both {"cosine": {...}, "linear": {...}} and flat {...} layouts.
        if schedule_name in schedule_cfg and isinstance(schedule_cfg[schedule_name], dict):
            kwargs = dict(schedule_cfg[schedule_name])
        elif not any(k in _SCHEDULE_FNS for k in schedule_cfg):
            kwargs = dict(schedule_cfg)
    return _SCHEDULE_FNS[schedule_name](timesteps=timesteps, **kwargs)


@struct.dataclass
class ScheduleConstants:
    """Immutable pytree of per-timestep diffusion constants (all shape ``[T]``).

    One-for-one with the table precomputed by the reference's
    GaussianDiffusion.compute_constants (gaussian_diffusion.py:44-83), plus the
    two extra WaveGrad tables (wavegrad_diffusion.py:101-117):
    ``sqrt_alphas_cumprod_prev`` is ``[T+1]`` (leading 1.0) and
    ``sqrt_alphas_cumprod_m1 = sqrt(1-acp) / sqrt(acp)``.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    log_betas: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # WaveGrad extras
    sqrt_alphas_cumprod_prev: jnp.ndarray  # [T + 1]
    sqrt_alphas_cumprod_m1: jnp.ndarray

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale a beta schedule so the terminal SNR is exactly zero.

    Lin et al. 2024 ("Common Diffusion Noise Schedules and Sampler Designs
    are Flawed"), Algorithm 1 — beyond the reference's surface (its
    schedules all leave ᾱ_T > 0, so the model never trains on pure noise
    while sampling starts from it). Operates on √ᾱ: shift so the last value
    is 0, rescale so the first keeps its original value, then convert back
    to betas. Requires a non-ε-prediction objective (at SNR 0 the noise
    target is unidentifiable) — enforced where the knob is consumed
    (modules/gaussian_diffusion.py).
    """
    betas = np.asarray(betas, dtype=np.float64)
    sqrt_ab = np.sqrt(np.cumprod(1.0 - betas))
    first, last = sqrt_ab[0], sqrt_ab[-1]
    sqrt_ab = (sqrt_ab - last) * first / (first - last)
    ab = sqrt_ab**2
    alphas = np.concatenate([ab[:1], ab[1:] / ab[:-1]])
    return 1.0 - alphas


def compute_schedule_constants(
    timesteps: int,
    schedule_name: str,
    schedule_cfg: Optional[Dict[str, Any]] = None,
    betas: Optional[np.ndarray] = None,
) -> ScheduleConstants:
    """Build the full constant table from a beta schedule.

    All derived quantities are computed in float64 on host for accuracy and
    stored as float32 device arrays.
    """
    if betas is None:
        betas = get_named_beta_schedule(schedule_name, timesteps, schedule_cfg)
    betas = np.asarray(betas, dtype=np.float64)
    if betas.shape != (timesteps,):
        raise ValueError(f"betas must have shape ({timesteps},), got {betas.shape}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # Variance is 0 at t=0; clip the log by reusing the t=1 value
    # (reference gaussian_diffusion.py:74-77).
    posterior_log_variance_clipped = np.log(
        np.concatenate([[posterior_variance[1]], posterior_variance[1:]])
    )

    sqrt_acp_prev_with_last = np.sqrt(np.concatenate([[1.0], alphas_cumprod]))

    def f32(x):
        return jnp.asarray(np.asarray(x, dtype=np.float32))

    # A zero-terminal-SNR schedule (rescale_zero_terminal_snr) has ᾱ_T = 0
    # exactly: the 1/ᾱ family of constants is +inf at T. That is correct —
    # those tables are only consumed by the ε-prediction formulas, which the
    # process layer forbids under zero_terminal_snr — so only the host
    # divide warnings are silenced here.
    with np.errstate(divide="ignore"):
        return ScheduleConstants(
            betas=f32(betas),
            alphas=f32(alphas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_recip_alphas=f32(np.sqrt(1.0 / alphas)),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            log_betas=f32(np.log(betas)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            sqrt_alphas_cumprod_prev=f32(sqrt_acp_prev_with_last),
            sqrt_alphas_cumprod_m1=f32(
                np.sqrt(1.0 - alphas_cumprod) * np.sqrt(1.0 / alphas_cumprod)
            ),
        )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-example constants and broadcast over trailing dims.

    Replaces the reference's host-synced ``a.gather(-1, t.cpu()).to(t.device)``
    (diffusion_process.py:84-87). Two TPU-tuned paths:

    - **scalar t** (the sampling scan: one t for the whole batch): a single
      ``dynamic_index`` → ``[1, 1, ..., 1]`` broadcastable — TPU batched
      gathers from small tables cost ~0.6 ms each, a scalar slice is ~free;
    - **batched t** (training: per-example t): a one-hot matmul on the MXU at
      HIGHEST precision, which beats the gather lowering for [B]←[T] lookups.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        out = jax.lax.dynamic_index_in_dim(table, t, keepdims=False)
        return out.reshape((1,) * ndim)
    onehot = jax.nn.one_hot(t, table.shape[0], dtype=table.dtype)
    out = jnp.dot(onehot, table, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))
