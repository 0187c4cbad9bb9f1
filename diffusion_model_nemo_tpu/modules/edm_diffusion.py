"""EDM-native diffusion — Karras et al. 2022 (arXiv:2206.00364), the full
training-side design space, not just the sampler.

Beyond the reference's model surface (its trainable processes are all
discrete-time DDPM chains, diffusion_model_nemo/modules/gaussian_diffusion.py;
this package's KarrasDiffusion applies the EDM *sampler* to those VP models):
this process trains the network in EDM's own parameterization —

    x_sigma = x0 + sigma * eps,                      (VE path, no schedule table)
    D(x; sigma) = c_skip(sigma) * x + c_out(sigma) * F(c_in(sigma) * x, c_noise(sigma)),

with the paper's preconditioning (Table 1, "EDM" column; sigma_d = sigma_data)

    c_skip = sigma_d^2 / (sigma^2 + sigma_d^2)
    c_out  = sigma * sigma_d / sqrt(sigma^2 + sigma_d^2)
    c_in   = 1 / sqrt(sigma^2 + sigma_d^2)
    c_noise = ln(sigma) / 4,

training noise levels ln(sigma) ~ N(P_mean, P_std^2) (eq. 6) and loss weight
lambda(sigma) = (sigma^2 + sigma_d^2) / (sigma * sigma_d)^2, which satisfies
lambda * c_out^2 = 1 — so the weighted D-space loss equals a unit-weight MSE
on the raw network output (loss/edm_loss.py implements it in the stable
F-space form; tests/test_edm.py pins the identity).

Sampling is the paper's Algorithm 2 (the same math as karras_diffusion.py,
which handles VP-trained models through a coordinate change this process
does not need): rho-spaced sigma grid, Heun 2nd-order probability-flow
integration with a final Euler step to sigma = 0, optional stochastic churn.

TPU design, matching the other processes in this package: every per-step
scalar (sigma grid, churn inflation, conditioning values, dt) is precomputed
on host into [M] vectors fed to ``lax.scan`` as xs; the compiled body is the
network call(s) plus fused elementwise math with zero table gathers; the
carried state is flattened to [B, H*W*C] so elementwise updates fill all 128
VPU lanes.

The sigma->0 boundary makes the ODE time-reversible from sigma_min upward,
so :meth:`encode` integrates data -> latent on the reversed grid (exact up
to solver error), giving latent-space :meth:`interpolate` like the
rectified-flow family.

The network conditioning is ``c_noise(sigma) * time_scale`` (default 250) so
the sinusoidal time embedding sees DDPM-range magnitudes (c_noise spans only
about [-1.6, 1.1] over the default sigma range) and the stock U-Net config
transfers unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from .diffusion_process import ModelFn, _scan_unroll

__all__ = ["EDMProcess"]


@register_target(
    "diffusion_model_nemo.modules.EDMProcess",
    "diffusion_model_nemo_tpu.modules.EDMProcess",
)
class EDMProcess:
    """Stateless holder of the EDM path, preconditioning, and sampler.

    Args:
        sample_steps: sigma-grid size M for sampling (NFE = 2M-1 for Heun,
            M for Euler).
        solver: ``heun`` (paper default, 2nd order) or ``euler``.
        sigma_data: data standard deviation sigma_d ([-1,1] images ~ 0.5).
        sigma_min / sigma_max: sampling grid endpoints (paper: 0.002 / 80).
        rho: grid warp exponent (paper: 7).
        p_mean / p_std: training lognormal ln(sigma) ~ N(p_mean, p_std^2).
        s_churn / s_noise / s_tmin / s_tmax: Algorithm 2 stochasticity.
        time_scale: multiplier on c_noise before the network sees it.
        clip_denoised: clamp D to [-1, 1] during sampling (off by default —
            EDM uses the raw denoiser output).
    """

    use_class_conditioning = False
    objective = "edm_denoiser"

    def __init__(
        self,
        sample_steps: int = 18,
        solver: str = "heun",
        sigma_data: float = 0.5,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        time_scale: float = 250.0,
        clip_denoised: bool = False,
    ):
        if solver not in ("euler", "heun"):
            raise ValueError(f"solver must be euler|heun, got {solver!r}")
        if int(sample_steps) < 2:
            raise ValueError(f"sample_steps must be >= 2, got {sample_steps}")
        if not (0.0 < float(sigma_min) < float(sigma_max)):
            raise ValueError(f"need 0 < sigma_min < sigma_max, got {sigma_min}, {sigma_max}")
        if float(sigma_data) <= 0.0:
            raise ValueError(f"sigma_data must be > 0, got {sigma_data}")
        self.sample_steps = int(sample_steps)
        self.solver = str(solver)
        self.sigma_data = float(sigma_data)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)
        self.s_churn = float(s_churn)
        self.s_noise = float(s_noise)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.time_scale = float(time_scale)
        self.clip_denoised = bool(clip_denoised)
        # jit-cache invalidation hook (AbstractDiffusionModel._jitted)
        self.version = 0

    # ---- preconditioning (Table 1) ------------------------------------------------
    def precond(self, sigma: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """(c_skip, c_out, c_in, c_noise) at sigma (any shape, elementwise)."""
        sigma = jnp.asarray(sigma, jnp.float32)
        sd2 = self.sigma_data**2
        denom = sigma**2 + sd2
        c_skip = sd2 / denom
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(denom)
        c_in = jax.lax.rsqrt(denom)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise

    def loss_weight(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """lambda(sigma) = (sigma^2 + sigma_d^2) / (sigma sigma_d)^2 = 1/c_out^2."""
        sigma = jnp.asarray(sigma, jnp.float32)
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2

    def model_time(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Network conditioning value for noise level sigma."""
        return 0.25 * jnp.log(jnp.asarray(sigma, jnp.float32)) * self.time_scale

    # ---- training-side path ---------------------------------------------------------
    def sample_sigmas(self, key: jax.Array, batch: int) -> jnp.ndarray:
        """ln(sigma) ~ N(P_mean, P_std^2) (eq. 6), [B]."""
        z = jax.random.normal(key, (batch,), jnp.float32)
        return jnp.exp(self.p_mean + self.p_std * z)

    def q_sample(self, x_start: jnp.ndarray, sigma: jnp.ndarray, noise: jnp.ndarray):
        """VE path point: x_sigma = x0 + sigma * eps (sigma: [B] or 0-d)."""
        sigma = jnp.asarray(sigma, x_start.dtype)
        sigma = sigma.reshape(sigma.shape + (1,) * (x_start.ndim - sigma.ndim))
        return x_start + sigma * noise

    def denoise(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        clip: Optional[bool] = None,
    ) -> jnp.ndarray:
        """Preconditioned denoiser D(x; sigma). sigma is [B] or scalar."""
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (x.shape[0],))
        c_skip, c_out, c_in, _ = self.precond(
            sigma_b.reshape((-1,) + (1,) * (x.ndim - 1))
        )
        t_net = self.model_time(sigma_b)
        F = model_fn(params, (c_in * x).astype(x.dtype), t_net)
        D = c_skip * x + c_out * F
        if clip if clip is not None else self.clip_denoised:
            D = jnp.clip(D, -1.0, 1.0)
        return D

    # ---- sigma grid (eq. 5) ------------------------------------------------------------
    def _sigma_grid(self, num_steps: Optional[int] = None) -> np.ndarray:
        """Descending [M+1] grid: rho-spaced sigma_max..sigma_min, then 0."""
        M = int(num_steps) if num_steps else self.sample_steps
        if M < 2:
            raise ValueError(f"num_steps must be >= 2, got {M}")
        inv_rho = 1.0 / self.rho
        ramp = np.linspace(0.0, 1.0, M)
        sig = (
            self.sigma_max**inv_rho
            + ramp * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)
        ) ** self.rho
        return np.concatenate([sig, [0.0]])

    def _solver_coefficients(self, num_steps: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Host-side per-transition scalars, [M] vectors (Algorithm 2 lines 4-7).

        Per transition i (sigma_i -> sigma_{i+1}):
          sigma_hat — churn-inflated start sigma (== sigma_i when no churn)
          noise_std — s_noise * sqrt(sigma_hat^2 - sigma_i^2)
          sigma_next, dt — target sigma and (sigma_next - sigma_hat)
        """
        sig = self._sigma_grid(num_steps)
        M = len(sig) - 1
        gamma = np.zeros(M)
        if self.s_churn > 0.0:
            g = min(self.s_churn / M, np.sqrt(2.0) - 1.0)
            in_window = (sig[:M] >= self.s_tmin) & (sig[:M] <= self.s_tmax)
            gamma = np.where(in_window, g, 0.0)
        sigma_hat = sig[:M] * (1.0 + gamma)
        noise_std = self.s_noise * np.sqrt(np.maximum(sigma_hat**2 - sig[:M] ** 2, 0.0))
        f32 = lambda v: np.asarray(v, np.float32)
        return {
            "sigma_hat": f32(sigma_hat),
            "noise_std": f32(noise_std),
            "sigma_next": f32(sig[1:]),
            "dt": f32(sig[1:] - sigma_hat),
        }

    # ---- ODE integration -----------------------------------------------------------------
    def _integrate(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jnp.ndarray,
        shape: Tuple[int, ...],
        key: Optional[jax.Array],
        coefs: Dict[str, jnp.ndarray],
        return_frames: bool,
        final_euler: bool = True,
    ):
        """Fused scan of dx/dsigma = (x - D(x, sigma))/sigma over the grid.

        ``key=None`` disables churn (deterministic body — used by encode).
        With ``final_euler`` (sampling), Heun runs M-1 corrected steps in the
        scan and takes the final transition as plain Euler (at sigma = 0 the
        slope (x - D)/sigma is undefined — the standard EDM boundary;
        NFE = 2M-1); encode's ascending grid has no singular endpoint, so it
        passes ``final_euler=False`` and corrects every transition.
        x enters/leaves flat [B, H*W*C].
        """
        stochastic = key is not None and self.s_churn > 0.0
        heun = self.solver == "heun"
        M = int(coefs["sigma_hat"].shape[0])

        def d_at(x_flat, sigma):
            x_img = x_flat.reshape(shape)
            D = self.denoise(model_fn, params, x_img, sigma).reshape(x_flat.shape)
            return (x_flat - D) / jnp.maximum(sigma, 1e-12)

        def euler_half(x, k, cs):
            if stochastic:
                k, sub = jax.random.split(k)
                x = x + cs["noise_std"] * jax.random.normal(sub, x.shape, dtype=x.dtype)
            d = d_at(x, cs["sigma_hat"])
            return x, x + cs["dt"] * d, d, k

        def euler_step(carry, cs):
            x, k = carry
            _, x_e, _, k = euler_half(x, k, cs)
            y = ((x_e + 1.0) * 0.5).reshape(shape) if return_frames else None
            return (x_e, k), y

        def heun_step(carry, cs):
            x, k = carry
            x, x_e, d, k = euler_half(x, k, cs)
            d2 = d_at(x_e, cs["sigma_next"])
            x_n = x + cs["dt"] * 0.5 * (d + d2)
            y = ((x_n + 1.0) * 0.5).reshape(shape) if return_frames else None
            return (x_n, k), y

        flat = x.reshape(shape[0], -1)
        k0 = key if key is not None else jax.random.PRNGKey(0)
        if heun and not final_euler:
            (flat, _), frames = jax.lax.scan(
                heun_step, (flat, k0), coefs, unroll=_scan_unroll()
            )
        elif heun and M > 1:
            head = {k: v[: M - 1] for k, v in coefs.items()}
            last = {k: v[M - 1] for k, v in coefs.items()}
            (flat, k0), frames = jax.lax.scan(
                heun_step, (flat, k0), head, unroll=_scan_unroll()
            )
            (flat, _), y_last = euler_step((flat, k0), last)
            if return_frames:
                frames = jnp.concatenate([frames, y_last[None]], axis=0)
        else:
            (flat, _), frames = jax.lax.scan(
                euler_step, (flat, k0), coefs, unroll=_scan_unroll()
            )
        return flat.reshape(shape), frames

    # ---- public sampling surface (p_sample_loop contract) --------------------------------
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
        """Algorithm 2: prior x ~ N(0, sigma_max^2) -> data; [B,H,W,C] in [0,1]."""
        coefs = {k: jnp.asarray(v) for k, v in self._solver_coefficients(num_steps).items()}
        key, init_key = jax.random.split(key)
        if img is None:
            img = jax.random.normal(init_key, shape, dtype=jnp.float32) * self.sigma_max
        img, frames = self._integrate(
            model_fn, params, img, tuple(shape), key, coefs, return_frames
        )
        out = (img + 1.0) * 0.5 if unnormalize else img
        if return_frames:
            return out, frames
        return out

    def encode(
        self,
        model_fn: ModelFn,
        params: Any,
        x0: jnp.ndarray,
        num_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        """Data -> latent: integrate the probability-flow ODE sigma_min ->
        sigma_max on the reversed grid (deterministic; churn disabled).
        Input in [-1, 1] data space; output is on the N(0, sigma_max^2) prior
        scale. The sigma_min -> 0 tail is skipped (data stands in for the
        sigma_min marginal — the same convention consistency models use for
        their boundary)."""
        sig = self._sigma_grid(num_steps)[:-1][::-1]  # ascending, no 0
        f32 = lambda v: jnp.asarray(np.ascontiguousarray(v), jnp.float32)
        coefs = {
            "sigma_hat": f32(sig[:-1]),
            "noise_std": f32(np.zeros(len(sig) - 1)),
            "sigma_next": f32(sig[1:]),
            "dt": f32(sig[1:] - sig[:-1]),
        }
        z, _ = self._integrate(
            model_fn, params, x0, tuple(x0.shape), None, coefs, False,
            final_euler=False,
        )
        return z

    def likelihood(
        self,
        model_fn: ModelFn,
        params: Any,
        data: jnp.ndarray,
        key: jax.Array,
        num_steps: Optional[int] = None,
        hutchinson_type: str = "rademacher",
    ):
        """NLL in bits/dim via the probability-flow ODE (sigma_min -> sigma_max).

        Instantaneous change of variables along dx/dsigma = (x - D)/sigma:

            log p(x) = log p_prior(z) + ∫_{sigma_min}^{sigma_max} div f dsigma,

        with prior N(0, (sigma_max^2 + sigma_data^2) I) (the sigma_max marginal
        of x0 + sigma eps with Var[x0] = sigma_data^2 — the same convention
        VESDE's prior_logp uses, with the data-variance term that sigma_max >>
        sigma_data usually makes negligible retained for small-sigma_max use).
        The sigma < sigma_min tail is not integrated (data stands in for the
        sigma_min marginal), so this is exact only up to that boundary — like
        the score-SDE estimator's eps cutoff. Hutchinson divergence via
        ``jax.vjp`` (reverse-mode, Pallas-kernel compatible); Heun corrects
        both x and logdet with shared evaluations — 2 per transition, so
        NFE = 2(sample_steps - 1) (Euler: sample_steps - 1).

        Returns (bpd [B], latent z, nfe).
        """
        if hutchinson_type not in ("rademacher", "gaussian"):
            raise ValueError(
                "`hutchinson_type` must be one of `rademacher` or `gaussian`"
            )
        shape = tuple(data.shape)
        B = shape[0]
        if hutchinson_type == "gaussian":
            epsilon = jax.random.normal(key, shape, dtype=jnp.float32)
        else:
            epsilon = (
                jax.random.randint(key, shape, 0, 2).astype(jnp.float32) * 2.0 - 1.0
            )
        eps_flat = epsilon.reshape(B, -1)
        sig = self._sigma_grid(num_steps)[:-1][::-1]  # ascending, no 0
        sig_hat = jnp.asarray(np.ascontiguousarray(sig[:-1]), jnp.float32)
        sig_next = jnp.asarray(np.ascontiguousarray(sig[1:]), jnp.float32)
        dt = sig_next - sig_hat
        M = int(sig_hat.shape[0])
        heun = self.solver == "heun"

        def f_div(x_flat, sigma):
            def f(y):
                y_img = y.reshape(shape)
                D = self.denoise(model_fn, params, y_img, sigma, clip=False)
                return ((y_img - D) / jnp.maximum(sigma, 1e-12)).reshape(y.shape)

            f_val, pullback = jax.vjp(f, x_flat)
            (eps_J,) = pullback(eps_flat)
            div = jnp.sum(eps_J * eps_flat, axis=1)
            return f_val, div

        def euler_step(carry, cs):
            x, ld = carry
            v, dv = f_div(x, cs[0])
            return (x + cs[2] * v, ld + cs[2] * dv), None

        def heun_step(carry, cs):
            x, ld = carry
            v1, d1 = f_div(x, cs[0])
            x_e = x + cs[2] * v1
            v2, d2 = f_div(x_e, cs[1])
            return (
                x + cs[2] * 0.5 * (v1 + v2),
                ld + cs[2] * 0.5 * (d1 + d2),
            ), None

        flat = data.astype(jnp.float32).reshape(B, -1)
        (z_flat, delta), _ = jax.lax.scan(
            heun_step if heun else euler_step,
            (flat, jnp.zeros((B,), jnp.float32)),
            (sig_hat, sig_next, dt),
            unroll=_scan_unroll(),
        )
        D_dims = int(np.prod(shape[1:]))
        prior_var = self.sigma_max**2 + self.sigma_data**2
        prior_logp = -0.5 * (
            jnp.sum(z_flat**2, axis=1) / prior_var
            + D_dims * np.log(2.0 * np.pi * prior_var)
        )
        bpd = -(prior_logp + delta) / np.log(2.0) / D_dims + 7.0
        nfe = 2 * M if heun else M
        return bpd, z_flat.reshape(shape), jnp.asarray(nfe, jnp.float32)

    def interpolate(
        self,
        model_fn: ModelFn,
        params: Any,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        key: jax.Array,
        t: Optional[int] = None,
        lambd: float = 0.5,
    ):
        """Latent-space slerp (encode -> slerp -> decode), like the
        rectified-flow family. ``t`` optionally overrides the grid size; the
        key is unused (deterministic ODE) but kept for interface parity.
        Inputs in [0, 1] display space."""
        del key
        x1 = x1 * 2.0 - 1.0
        x2 = x2 * 2.0 - 1.0
        num_steps = int(t) if t else None
        z1 = self.encode(model_fn, params, x1, num_steps)
        z2 = self.encode(model_fn, params, x2, num_steps)
        f1, f2 = z1.reshape(z1.shape[0], -1), z2.reshape(z2.shape[0], -1)
        n1 = f1 / jnp.linalg.norm(f1, axis=1, keepdims=True)
        n2 = f2 / jnp.linalg.norm(f2, axis=1, keepdims=True)
        omega = jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=1), -1.0, 1.0))[:, None]
        so = jnp.maximum(jnp.sin(omega), 1e-6)
        lam = float(lambd)
        z = (
            jnp.sin((1.0 - lam) * omega) / so * f1 + jnp.sin(lam * omega) / so * f2
        ).reshape(z1.shape)
        return self.p_sample_loop(
            model_fn, params, z.shape, jax.random.PRNGKey(0), img=z,
            num_steps=num_steps,
        )
