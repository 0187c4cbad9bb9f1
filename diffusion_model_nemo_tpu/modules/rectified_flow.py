"""Rectified flow / conditional flow matching (Liu et al. 2022,
arXiv:2209.03003; Lipman et al. 2022, arXiv:2210.02747).

Beyond the reference's model surface (its processes are all discrete-time
DDPM-family chains, diffusion_model_nemo/modules/gaussian_diffusion.py): the
linear-interpolation probability path

    x_t = (1 - t) * x0 + t * eps,          t in [0, 1]

whose marginal velocity field is regressed directly,

    v_theta(x_t, t)  <-  eps - x0          (the path's constant velocity),

and sampling is deterministic ODE integration of dx/dt = v_theta from t=1
(pure noise) to t=0 (data). Straight-line paths make coarse grids accurate:
on a model that has collapsed to one mode the trajectory IS a straight line
and a SINGLE Euler step is exact (tests/test_rectified_flow.py pins this).

TPU design, matching the other processes in this package:

- training draws per-sample continuous t (uniform, or SD3-style
  logit-normal) — no table, no gathers;
- sampling is one fused ``lax.scan`` over a host-precomputed [M] grid of
  (t, t_next, dt) scalars fed as scan xs; the body is the network call plus
  a fused multiply-add. ``solver="heun"`` adds the 2nd-order correction
  (two calls per step, NFE = 2M);
- the ODE is time-reversible, so :meth:`encode` integrates data -> latent
  with the same compiled body (exact inversion up to solver error), giving
  latent-space :meth:`interpolate` — something the stochastic DDPM chain can
  only approximate.

The network is conditioned on ``t * time_scale`` (default 1000) so the
sinusoidal embedding sees DDPM-range magnitudes and the stock U-Net config
transfers unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from .diffusion_process import ModelFn, _scan_unroll
from .gaussian_diffusion import batched_t

__all__ = ["RectifiedFlowProcess"]


@register_target(
    "diffusion_model_nemo.modules.RectifiedFlowProcess",
    "diffusion_model_nemo_tpu.modules.RectifiedFlowProcess",
)
class RectifiedFlowProcess:
    """Stateless holder of the flow-matching path + ODE sampler.

    Args:
        sample_steps: ODE grid size M for sampling (NFE = M for Euler,
            2M for Heun).
        solver: ``euler`` (default) or ``heun`` (2nd-order midpoint-average).
        time_scale: multiplier applied to t before the network sees it.
        time_sampling: training-time t distribution — ``uniform`` on [0, 1]
            or ``logit_normal`` (sigmoid of N(mean, std); Esser et al. 2024,
            arXiv:2403.03206 — upweights mid-path times where the regression
            is hardest).
        logit_mean / logit_std: parameters of the logit-normal.
        clip_denoised: unused (kept for config-surface uniformity with the
            DDPM-family processes; velocity integration has no x0 to clip
            per step).
    """

    use_class_conditioning = False
    objective = "pred_velocity"

    def __init__(
        self,
        sample_steps: int = 50,
        solver: str = "euler",
        time_scale: float = 1000.0,
        time_sampling: str = "uniform",
        logit_mean: float = 0.0,
        logit_std: float = 1.0,
        clip_denoised: bool = False,
    ):
        if solver not in ("euler", "heun"):
            raise ValueError(f"solver must be euler|heun, got {solver!r}")
        if time_sampling not in ("uniform", "logit_normal"):
            raise ValueError(
                f"time_sampling must be uniform|logit_normal, got {time_sampling!r}"
            )
        if int(sample_steps) < 1:
            raise ValueError(f"sample_steps must be >= 1, got {sample_steps}")
        self.sample_steps = int(sample_steps)
        self.solver = str(solver)
        self.time_scale = float(time_scale)
        self.time_sampling = str(time_sampling)
        self.logit_mean = float(logit_mean)
        self.logit_std = float(logit_std)
        self.clip_denoised = bool(clip_denoised)
        # jit-cache invalidation hook (AbstractDiffusionModel._jitted)
        self.version = 0

    # ---- training-side path ----------------------------------------------------
    def sample_times(self, key: jax.Array, batch: int) -> jnp.ndarray:
        """Draw per-sample path times t in [0, 1]."""
        if self.time_sampling == "logit_normal":
            z = jax.random.normal(key, (batch,), jnp.float32)
            return jax.nn.sigmoid(self.logit_mean + self.logit_std * z)
        return jax.random.uniform(key, (batch,), jnp.float32)

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        """Point on the linear path: x_t = (1-t) x0 + t eps (t: [B] or 0-d)."""
        t = jnp.asarray(t, x_start.dtype)
        t = t.reshape(t.shape + (1,) * (x_start.ndim - t.ndim))
        return (1.0 - t) * x_start + t * noise

    def v_target(self, x_start: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """The regression target — the path's (constant) velocity."""
        return noise - x_start

    def model_time(self, t: jnp.ndarray) -> jnp.ndarray:
        """Network conditioning value for path time t."""
        return jnp.asarray(t, jnp.float32) * self.time_scale

    # ---- ODE grid ----------------------------------------------------------------
    def _grid(self, num_steps: Optional[int], reverse: bool) -> dict:
        """Host-precomputed per-transition scalars, [M] vectors.

        ``reverse=False``: t = 1 -> 0 (sampling). ``reverse=True``: 0 -> 1
        (encoding). dt carries the sign, so one scan body serves both.
        """
        M = int(num_steps) if num_steps else self.sample_steps
        if M < 1:
            raise ValueError(f"num_steps must be >= 1, got {M}")
        grid = np.linspace(0.0, 1.0, M + 1) if reverse else np.linspace(1.0, 0.0, M + 1)
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return {
            "t": f32(grid[:-1]),
            "t_next": f32(grid[1:]),
            "dt": f32(grid[1:] - grid[:-1]),
        }

    # ---- ODE integration ------------------------------------------------------------
    def _integrate(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jnp.ndarray,
        shape: Tuple[int, ...],
        num_steps: Optional[int],
        reverse: bool,
        return_frames: bool,
    ):
        """Fused scan of dx/dt = v_theta over the grid. x enters/leaves flat
        [B, H*W*C] (the per-step FMA fills all 128 VPU lanes; the network
        still sees image shapes).

        Heun runs M-1 corrected steps in the scan and takes the final
        transition as plain Euler outside it (the EDM boundary convention,
        karras_diffusion.py does the same at sigma=0): the 2nd evaluation on
        the last step lands exactly on the endpoint, where a straight-line
        trajectory's correction is zero — keeping it would halve the final
        update on the analytic single-point field the tests pin. NFE = 2M-1.
        """
        coefs = self._grid(num_steps, reverse)
        heun = self.solver == "heun"

        def v_at(x_flat, t):
            x_img = x_flat.reshape(shape)
            out = model_fn(params, x_img, batched_t(self.model_time(t), x_img))
            return out.reshape(x_flat.shape)

        def euler_step(x, cs):
            x_n = x + cs["dt"] * v_at(x, cs["t"])
            y = ((x_n + 1.0) * 0.5).reshape(shape) if return_frames else None
            return x_n, y

        def heun_step(x, cs):
            v = v_at(x, cs["t"])
            x_e = x + cs["dt"] * v
            v2 = v_at(x_e, cs["t_next"])
            x_n = x + cs["dt"] * 0.5 * (v + v2)
            y = ((x_n + 1.0) * 0.5).reshape(shape) if return_frames else None
            return x_n, y

        flat = x.reshape(shape[0], -1)
        M = int(coefs["t"].shape[0])
        if heun and M > 1:
            head = {k: v[: M - 1] for k, v in coefs.items()}
            last = {k: v[M - 1] for k, v in coefs.items()}
            flat, frames = jax.lax.scan(heun_step, flat, head, unroll=_scan_unroll())
            flat, y_last = euler_step(flat, last)
            if return_frames:
                frames = jnp.concatenate([frames, y_last[None]], axis=0)
        else:
            flat, frames = jax.lax.scan(euler_step, flat, coefs, unroll=_scan_unroll())
        return flat.reshape(shape), frames

    # ---- public sampling surface (p_sample_loop contract) ----------------------------
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
        """Integrate noise -> data; returns [B,H,W,C] in [0,1] (like the
        DDPM-family processes' fused sampling scans)."""
        if img is None:
            img = jax.random.normal(key, shape, dtype=jnp.float32)
        img, frames = self._integrate(
            model_fn, params, img, tuple(shape), num_steps, False, return_frames
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
        """Data -> latent by integrating the SAME ODE forward (0 -> 1).

        Deterministic and (up to solver error) the exact inverse of
        :meth:`p_sample_loop` on the same grid — the flow-matching analogue
        of DDIM inversion. Input in [-1, 1] data space.
        """
        z, _ = self._integrate(
            model_fn, params, x0, tuple(x0.shape), num_steps, True, False
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
        """Exact NLL in bits/dim via the instantaneous change of variables.

        The flow ODE transports data (t=0) to the N(0, I) prior (t=1), and

            log p_0(x_0) = log p_1(z) + ∫_0^1 div v(x(t), t) dt

        (continuous change of variables; Chen et al. 2018 eq. 4 — for the
        deterministic flow this is the EXACT likelihood, unlike the discrete
        DDPM-family VLB bound). The divergence is the Hutchinson–Skilling
        estimate εᵀJε via one in-graph ``jax.vjp`` per evaluation
        (reverse-mode, like sde_lib/likelihood.py — and compatible with the
        custom_vjp Pallas kernels, which forward-mode isn't); unbiased for
        any field, and per-probe EXACT when the Jacobian is diagonal
        (rademacher ε has ε_i² = 1 — tests pin J = a·I). The augmented
        [x, logdet] state integrates
        on the process's own grid/solver with shared network evaluations
        (Heun corrects both x and logdet; NFE = 2M, Euler M).

        Conventions match the score-SDE estimator: data in [-1, 1] space,
        bits/dim offset +7 = log2(128) for uint8-scaled data.

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
        coefs = self._grid(num_steps, reverse=True)  # t: 0 -> 1
        heun = self.solver == "heun"
        M = int(coefs["t"].shape[0])

        def v_div(x_flat, t):
            def f(y):
                y_img = y.reshape(shape)
                out = model_fn(params, y_img, batched_t(self.model_time(t), y_img))
                return out.reshape(y.shape)

            v, pullback = jax.vjp(f, x_flat)
            (eps_J,) = pullback(eps_flat)
            div = jnp.sum(eps_J * eps_flat, axis=1)
            return v, div

        def euler_step(carry, cs):
            x, ld = carry
            v, dv = v_div(x, cs["t"])
            return (x + cs["dt"] * v, ld + cs["dt"] * dv), None

        def heun_step(carry, cs):
            x, ld = carry
            v1, d1 = v_div(x, cs["t"])
            x_e = x + cs["dt"] * v1
            v2, d2 = v_div(x_e, cs["t_next"])
            return (
                x + cs["dt"] * 0.5 * (v1 + v2),
                ld + cs["dt"] * 0.5 * (d1 + d2),
            ), None

        flat = data.astype(jnp.float32).reshape(B, -1)
        (z_flat, delta), _ = jax.lax.scan(
            heun_step if heun else euler_step,
            (flat, jnp.zeros((B,), jnp.float32)),
            coefs,
            unroll=_scan_unroll(),
        )
        D = int(np.prod(shape[1:]))
        prior_logp = -0.5 * (jnp.sum(z_flat**2, axis=1) + D * np.log(2.0 * np.pi))
        bpd = -(prior_logp + delta) / np.log(2.0) / D + 7.0
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
        """Semantic interpolation through the latent: encode both images
        (0 -> 1), slerp the latents, decode (1 -> 0). ``t`` (a step count in
        the DDPM-family signature) optionally overrides the grid size; the
        stochastic ``key`` is unused (the flow is deterministic) but kept for
        interface parity. Inputs in [0, 1] display space, like DDPM.interpolate."""
        del key
        x1 = x1 * 2.0 - 1.0
        x2 = x2 * 2.0 - 1.0
        num_steps = int(t) if t else None
        z1 = self.encode(model_fn, params, x1, num_steps)
        z2 = self.encode(model_fn, params, x2, num_steps)
        # slerp: latents are ~N(0, I), so interpolate along the sphere
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
