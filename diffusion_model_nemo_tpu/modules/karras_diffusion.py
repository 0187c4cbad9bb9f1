"""EDM / Karras sampler — Karras et al. 2022 (arXiv:2206.00364), Algorithm 2.

Beyond the reference's sampler surface (its fastest sampler is strided DDIM,
generalized_gaussian_diffusion.py): the EDM deterministic/stochastic sampler
— a Karras rho-spaced sigma grid, Heun (2nd-order) integration of the
probability-flow ODE, and optional stochastic "churn" — applied to any
discrete-time epsilon/x0/v model in the framework. Drop-in ``change_sampler``
target (same ``p_sample_loop`` contract as GaussianDiffusion).

Coordinate change: a VP-trained model with x_t = a·x0 + s·eps (a = sqrt(acp),
s = sqrt(1-acp), a^2 + s^2 = 1) is evaluated in EDM's variance-exploding
coordinates  x^ = x_t / a,  sigma^ = s / a,  so  x^ = x0 + sigma^·eps  and the
probability-flow ODE is  dx^/dsigma^ = (x^ - x0(x^, sigma^)) / sigma^.  The
network conditioning time for an off-grid sigma^ is the piecewise-linear
interpolation of log sigma^ over the model's discrete table (the k-diffusion
convention; exactly invertible, which the tests exploit).

TPU design: like DPMSolverDiffusion, every per-step scalar (sigma grid, churn
inflation, conditioning times, input scales) is precomputed on host into [M]
vectors fed to ``lax.scan`` as xs — the compiled body is network call(s) plus
fused elementwise math with zero table gathers. ``order=2`` scans M-1 Heun
steps (two network calls each) and takes the final step to sigma = 0 as a
single Euler step outside the scan (the standard Heun boundary; NFE = 2M-1).
``order=1`` is plain Euler (NFE = M); on ``grid="ddim"`` it reproduces the
DDIM eta=0 sampler exactly (tests/test_karras.py pins this lockstep).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from .diffusion_process import ModelFn, _scan_unroll
from .gaussian_diffusion import batched_t
from .generalized_gaussian_diffusion import GeneralizedGaussianDiffusion

__all__ = ["KarrasDiffusion"]


@register_target(
    "diffusion_model_nemo.modules.KarrasDiffusion",
    "diffusion_model_nemo_tpu.modules.KarrasDiffusion",
)
class KarrasDiffusion(GeneralizedGaussianDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
        solver_steps: int = 18,
        solver_order: int = 2,
        grid: str = "karras",
        rho: float = 7.0,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        clip_denoised: bool = True,
        class_conditional: bool = False,
    ):
        super().__init__(
            timesteps=timesteps,
            schedule_name=schedule_name,
            schedule_cfg=schedule_cfg,
            objective=objective,
            eta=0.0,
            ddim_timesteps=solver_steps,
            class_conditional=class_conditional,
        )
        if solver_order not in (1, 2):
            raise ValueError(f"solver_order must be 1 or 2, got {solver_order}")
        if grid not in ("karras", "ddim"):
            raise ValueError(f"grid must be karras|ddim, got {grid}")
        if solver_steps < 2:
            raise ValueError(f"solver_steps must be >= 2, got {solver_steps}")
        self.solver_steps = int(solver_steps)
        self.solver_order = int(solver_order)
        self.grid = grid
        self.rho = float(rho)
        self.sigma_min = None if sigma_min is None else float(sigma_min)
        self.sigma_max = None if sigma_max is None else float(sigma_max)
        self.s_churn = float(s_churn)
        self.s_noise = float(s_noise)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.clip_denoised = bool(clip_denoised)

    # ---- sigma grid / conditioning tables -------------------------------------
    def _log_sigma_table(self) -> np.ndarray:
        """[T] log(sigma^) at the discrete steps, increasing in t."""
        acp = np.asarray(self.constants.alphas_cumprod, np.float64)
        return 0.5 * (np.log1p(-acp) - np.log(acp))  # log(s/a)

    def _sigma_grid(self) -> Tuple[np.ndarray, np.ndarray]:
        """Descending sigma^ grid [M+1] (last entry 0) + conditioning t [M+1].

        ``karras``: the rho-spaced grid of Karras et al. eq. (5), endpoints
        defaulting to the schedule's own (sigma at t=0, sigma at t=T-1);
        conditioning times are the log-sigma interpolation described above.
        ``ddim``: the strided DDIM grid's exact sigmas and integer times (the
        apples-to-apples grid; order=1 on it IS DDIM eta=0).
        """
        lam = self._log_sigma_table()
        if self.grid == "ddim":
            seq, _ = self._strided_sequences()  # descending ints
            sig = np.exp(lam[seq])
            t_cond = seq.astype(np.float64)
        else:
            smin = self.sigma_min if self.sigma_min is not None else float(np.exp(lam[0]))
            smax = self.sigma_max if self.sigma_max is not None else float(np.exp(lam[-1]))
            if not (0.0 < smin < smax):
                raise ValueError(f"need 0 < sigma_min < sigma_max, got {smin}, {smax}")
            N = self.solver_steps
            inv_rho = 1.0 / self.rho
            ramp = np.linspace(0.0, 1.0, N)
            sig = (smax**inv_rho + ramp * (smin**inv_rho - smax**inv_rho)) ** self.rho
            t_cond = np.interp(np.log(sig), lam, np.arange(self.timesteps, dtype=np.float64))
        sig = np.concatenate([sig, [0.0]])
        t_cond = np.concatenate([t_cond, [0.0]])  # unused at sigma=0
        return sig, t_cond

    def _solver_coefficients(self) -> Dict[str, np.ndarray]:
        """Host-side per-transition scalars, [M] vectors (M = solver_steps).

        Per transition i (sigma_i -> sigma_{i+1}):
          sigma_hat   — churn-inflated start sigma^ (== sigma_i when no churn)
          noise_std   — s_noise * sqrt(sigma_hat^2 - sigma_i^2)
          t_hat, a_hat     — net conditioning time / input scale at sigma_hat
          t_next, a_next   — same at sigma_{i+1} (Heun's 2nd eval)
          sigma_next, dt   — target sigma^ and (sigma_next - sigma_hat)
        """
        sig, t_cond = self._sigma_grid()
        lam = self._log_sigma_table()
        M = len(sig) - 1

        gamma = np.zeros(M)
        if self.s_churn > 0.0:
            g = min(self.s_churn / M, np.sqrt(2.0) - 1.0)
            in_window = (sig[:M] >= self.s_tmin) & (sig[:M] <= self.s_tmax)
            gamma = np.where(in_window, g, 0.0)
        sigma_hat = sig[:M] * (1.0 + gamma)
        noise_std = self.s_noise * np.sqrt(np.maximum(sigma_hat**2 - sig[:M] ** 2, 0.0))
        # conditioning at the (possibly inflated) start sigma
        t_hat = np.where(
            gamma > 0.0,
            np.interp(np.log(np.maximum(sigma_hat, 1e-300)), lam, np.arange(self.timesteps, dtype=np.float64)),
            t_cond[:M],
        )
        a_hat = 1.0 / np.sqrt(1.0 + sigma_hat**2)
        a_next = 1.0 / np.sqrt(1.0 + sig[1:] ** 2)
        f32 = lambda v: np.asarray(v, np.float32)
        return {
            "sigma_hat": f32(sigma_hat),
            "noise_std": f32(noise_std),
            "t_hat": f32(t_hat),
            "a_hat": f32(a_hat),
            "sigma_next": f32(sig[1:]),
            "t_next": f32(t_cond[1:]),
            "a_next": f32(a_next),
            "dt": f32(sig[1:] - sigma_hat),
        }

    # ---- model wrapper ---------------------------------------------------------
    def _denoise(self, model_fn, params, xhat, t, a, sigma, net_shape):
        """x0 prediction at (x^ = xhat, sigma^) — net runs in model (VP) space."""
        x_net = (a * xhat).reshape(net_shape)
        out = model_fn(params, x_net, batched_t(t, x_net)).reshape(xhat.shape)
        if self.objective == "pred_noise":
            x0 = xhat - sigma * out
        elif self.objective == "pred_v":
            # x0 = a*x_t - s*v with x_t = a*xhat, s = sigma*a  =>  a*(a*xhat - sigma*v)
            x0 = a * (a * xhat - sigma * out)
        else:  # pred_x0
            x0 = out
        if self.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    # ---- sampling ----------------------------------------------------------------
    def p_sample_loop(
        self,
        model_fn: ModelFn,
        params: Any,
        shape: Tuple[int, ...],
        key: jax.Array,
        img: Optional[jnp.ndarray] = None,
        num_steps: Optional[int] = None,
        return_frames: bool = False,
        unnormalize: bool = True,
    ):
        del num_steps  # grid is controlled by solver_steps/grid/rho
        B = shape[0]
        coefs = {k: jnp.asarray(v) for k, v in self._solver_coefficients().items()}
        M = int(coefs["sigma_hat"].shape[0])
        stochastic = self.s_churn > 0.0

        key, init_key = jax.random.split(key)
        if img is None:
            # EDM prior: x^ ~ N(0, sigma_max^2) (data variance << sigma_max^2)
            sig_grid, _ = self._sigma_grid()
            img = jax.random.normal(init_key, shape, dtype=jnp.float32) * float(sig_grid[0])

        def d_at(x, cs, which):  # ODE slope (x^ - x0)/sigma at hat|next state
            sigma = cs[f"sigma_{which}"]
            x0 = self._denoise(
                model_fn, params, x, cs[f"t_{which}"], cs[f"a_{which}"], sigma, shape
            )
            return (x - x0) / jnp.maximum(sigma, 1e-12)

        def euler_half(x, k, cs):
            if stochastic:
                k, sub = jax.random.split(k)
                x = x + cs["noise_std"] * jax.random.normal(sub, x.shape, dtype=x.dtype)
            d = d_at(x, cs, "hat")
            return x, x + cs["dt"] * d, d, k

        def heun_step(carry, cs):
            x, k = carry
            x, x_e, d, k = euler_half(x, k, cs)
            d2 = d_at(x_e, cs, "next")
            x = x + cs["dt"] * 0.5 * (d + d2)
            y = self._frame(x, cs["a_next"]) if return_frames else None
            return (x, k), y

        def euler_step(carry, cs):
            x, k = carry
            x, x_e, _, k = euler_half(x, k, cs)
            y = self._frame(x_e, cs["a_next"]) if return_frames else None
            return (x_e, k), y

        flat = img.reshape(B, -1)
        if self.solver_order == 1:
            (flat, _), frames = jax.lax.scan(
                euler_step, (flat, key), coefs, unroll=_scan_unroll()
            )
            n_frames = M
        else:
            head = {k: v[: M - 1] for k, v in coefs.items()}
            last = {k: v[M - 1] for k, v in coefs.items()}
            (flat, key), frames = jax.lax.scan(
                heun_step, (flat, key), head, unroll=_scan_unroll()
            )
            (flat, _), y_last = euler_step((flat, key), last)
            if return_frames:
                frames = jnp.concatenate([frames, y_last[None]], axis=0)
            n_frames = M

        img = flat.reshape(shape)
        out = (img + 1.0) * 0.5 if unnormalize else img
        if return_frames:
            return out, frames.reshape((n_frames,) + tuple(shape))
        return out

    @staticmethod
    def _frame(xhat, a_next):
        # frames are displayed in data space: x_t = a*x^, then [0,1]
        return (a_next * xhat + 1.0) * 0.5
