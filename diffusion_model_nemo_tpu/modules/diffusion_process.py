"""Abstract diffusion-process interface.

TPU-native counterpart of the reference's ``AbstractDiffusionProcess``
(diffusion_model_nemo/modules/diffusion_process.py:39-91). Differences by
design:

- Processes are *stateless holders of a constant table* (a
  :class:`~diffusion_model_nemo_tpu.ops.schedules.ScheduleConstants` pytree in
  HBM); every method is a pure, traceable function.
- Model evaluation is passed in as ``model_fn(params, x, t) -> output`` with
  ``params`` explicit, so jitted callers cache compilations across parameter
  updates instead of baking weights into the jaxpr.
- Sampling loops are ``jax.lax.scan`` bodies that stay resident on device —
  no per-step host syncs (the reference copies every step to CPU,
  gaussian_diffusion.py:187).
- Randomness is threaded through explicit ``jax.random`` keys.

Layout note: all image tensors are **NHWC** (TPU-native), not the reference's
NCHW.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from ..ops.schedules import (
    SCHEDULE_NAMES,
    ScheduleConstants,
    compute_schedule_constants,
    extract,
)

__all__ = ["AbstractDiffusionProcess", "ModelFn"]

# model_fn(params, x_t, t_or_noise_level) -> network output
ModelFn = Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _scan_unroll() -> int:
    """Unroll factor for the reverse-chain scans (DMN_SAMPLE_SCAN_UNROLL,
    default 1). Unrolling lets XLA overlap one step's elementwise tail with
    the next step's network head at the cost of an N×-longer program; it is
    numerically identical (bitwise on the ancestral chain; compiler-rounding
    reassociation ~1e-8 on DDIM), so it is a pure perf knob (tools/microbench_unroll.py).
    Read at trace time — a changed env var invalidates nothing by itself;
    re-jit (fresh process or cache key) to take effect."""
    return max(1, int(os.environ.get("DMN_SAMPLE_SCAN_UNROLL", "1")))


class AbstractDiffusionProcess:
    """Base class: owns timesteps, schedule config, and the constant table."""

    use_class_conditioning: bool = False

    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
    ):
        if schedule_name not in SCHEDULE_NAMES:
            raise ValueError(
                f"Invalid schedule `{schedule_name}` provided to sampler !"
            )
        self.timesteps = int(timesteps)
        self.schedule_name = schedule_name
        self.schedule_cfg = dict(schedule_cfg) if schedule_cfg is not None else {}
        self.constants: ScheduleConstants = None  # set by compute_constants
        # Monotonically bumped whenever constants are recomputed, so callers
        # caching jitted closures over this object know to re-trace.
        self.version = 0

    # ---- schedule machinery -------------------------------------------------
    def compute_constants(self, timesteps: int) -> None:
        """(Re)build the constant table; mirrors the reference's mutable
        ``compute_constants`` hook so WaveGrad-style schedule hot-swaps keep
        the same public API. With ``zero_terminal_snr`` set on the process
        (GaussianDiffusion knob), the named schedule's betas are rescaled so
        ᾱ_T is exactly zero (ops/schedules.py:rescale_zero_terminal_snr)."""
        self.timesteps = int(timesteps)
        betas = None
        if getattr(self, "zero_terminal_snr", False):
            from ..ops.schedules import get_named_beta_schedule, rescale_zero_terminal_snr

            betas = rescale_zero_terminal_snr(
                get_named_beta_schedule(self.schedule_name, self.timesteps, self.schedule_cfg)
            )
        self.constants = compute_schedule_constants(
            self.timesteps, self.schedule_name, self.schedule_cfg, betas=betas
        )
        self.version += 1

    @staticmethod
    def extract(table: jnp.ndarray, t: jnp.ndarray, x_shape) -> jnp.ndarray:
        """Reference-compatible signature: gather + broadcast reshape."""
        return extract(table, t, len(x_shape))

    # ---- q / p space interface ----------------------------------------------
    def q_mean_variance(self, x_start, t):
        raise NotImplementedError()

    def q_posterior(self, x_start, x, t):
        raise NotImplementedError()

    def q_sample(self, x_start, t, noise):
        raise NotImplementedError()

    def p_mean_variance(self, model_fn, params, x, t, model_output=None):
        raise NotImplementedError()

    def p_sample(self, model_fn, params, x, t, key):
        raise NotImplementedError()

    def sample(self, model_fn, params, shape, key, **kwargs):
        raise NotImplementedError()

    def interpolate(self, model_fn, params, x1, x2, key, t=None, lambd=0.5):
        raise NotImplementedError()
