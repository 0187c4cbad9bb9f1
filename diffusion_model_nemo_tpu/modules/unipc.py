"""UniPC fast sampler — Zhao et al. 2023 (arXiv:2302.04867).

Beyond the reference's sampler surface (its fastest sampler is strided DDIM,
generalized_gaussian_diffusion.py): a unified predictor–corrector multistep
ODE solver in data-prediction form. The corrector (UniC) refines each step
with the model output that the next predictor step needs anyway, so it raises
the effective order by one at ZERO extra network evaluations — order-2+UniC
reaches DPM-Solver++(2M)-class quality a notch earlier, and order 3 is
available for very-few-step sampling. Drop-in ``change_sampler`` target for
every epsilon/x0/v model in the framework (same ``p_sample_loop`` contract as
GaussianDiffusion).

TPU design (same recipe as modules/dpm_solver.py): every per-step scalar —
sigma ratios, phi-function values, and the solved UniP/UniC simplex weights
(the R·rho = b Vandermonde systems of eq. 16/17) — depends only on the beta
schedule and the step grid, so it is all precomputed on host in float64 and
fed to ``lax.scan`` as xs. The compiled loop body is ONE network call plus
fused elementwise math with zero table gathers. The carry holds the running
sample, the previous corrected sample, and a 3-deep ring of x0 predictions
(the multistep memory), all flattened to [B, H·W·C] for full-lane math.

Exact relations exploited by the tests:
  * order 1 (no corrector) is DDIM eta=0 on the same grid;
  * order 2, variant "bh2", no corrector is algebraically DPM-Solver++(2M):
    the hardcoded rho_p = 1/2 weight times B_h = expm1(-h) reproduces
    D = (1 + 1/(2r)) x0_s - 1/(2r) x0_prev exactly;
  * on a constant-x0 field every order and the corrector are exact
    (variation-of-constants with constant integrand).

The data endpoint (alpha_bar = 1, infinite h) is handled order-1:
sigma_t/sigma_s -> 0 and -alpha_t*expm1(-h) -> 1, so the final update is
exactly x = x0_prediction; multistep weights there are precomputed as zeros.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from .diffusion_process import ModelFn
from .dpm_solver import DPMSolverDiffusion
from .gaussian_diffusion import batched_t

__all__ = ["UniPCDiffusion"]


@register_target(
    "diffusion_model_nemo.modules.UniPCDiffusion",
    "diffusion_model_nemo_tpu.modules.UniPCDiffusion",
)
class UniPCDiffusion(DPMSolverDiffusion):
    def __init__(
        self,
        timesteps: int,
        schedule_name: str,
        schedule_cfg: Optional[Dict[str, Any]] = None,
        objective: str = "pred_noise",
        solver_steps: int = 20,
        solver_order: int = 2,
        variant: str = "bh2",
        use_corrector: bool = True,
        lower_order_final: bool = True,
        clip_denoised: bool = True,
        time_spacing: str = "strided",
        class_conditional: bool = False,
    ):
        super().__init__(
            timesteps=timesteps,
            schedule_name=schedule_name,
            schedule_cfg=schedule_cfg,
            objective=objective,
            solver_steps=solver_steps,
            solver_order=1,  # placeholder; UniPC validates its own order below
            lower_order_final=lower_order_final,
            clip_denoised=clip_denoised,
            time_spacing=time_spacing,
            class_conditional=class_conditional,
        )
        if solver_order not in (1, 2, 3):
            raise ValueError(f"solver_order must be 1, 2 or 3, got {solver_order}")
        if variant not in ("bh1", "bh2"):
            raise ValueError(f"variant must be bh1|bh2, got {variant}")
        self.solver_order = int(solver_order)
        self.variant = variant
        self.use_corrector = bool(use_corrector)

    # ---- host-side coefficient tables -----------------------------------------
    def _phis(self, hh: float, order: int) -> Tuple[float, float, np.ndarray]:
        """phi_1 = expm1(hh), B(h), and the b-vector of the UniPC linear
        system (Zhao et al. 2023 eq. 16/17): b_k = phi_{k+1}(hh)·k!/B(h)."""
        h_phi_1 = np.expm1(hh)
        B_h = hh if self.variant == "bh1" else np.expm1(hh)
        b = []
        h_phi_k = h_phi_1 / hh - 1.0
        fact = 1.0
        for row in range(1, order + 1):
            b.append(h_phi_k * fact / B_h)
            fact *= row + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        return h_phi_1, B_h, np.asarray(b, np.float64)

    def _unipc_coefficients(self) -> Dict[str, np.ndarray]:
        """Per-step scan coefficients, all [M] float32.

        Predictor (UniP, state s0=seq[i] -> target seq_next[i]):
            x_next = p_cx·x + p_cm·m0 + pw0·(m1 − m0) + pw1·(m2 − m0)
        Corrector (UniC, refines x at s0 using the fresh m0 and the history
        anchored at s1=seq[i−1]; gated by g):
            x_corr = c_cx·x_last + c_cm·m1 + cw0·(m2 − m1) + cw1·(m3 − m1)
                     + cwt·(m0 − m1)
        where m_k is the x0 prediction evaluated at seq[i−k].
        """
        seq, seq_next = self._solver_sequences()
        acp_ext = np.asarray(self.alphas_extended_cumprod, np.float64)
        M = len(seq)
        a_s = np.sqrt(acp_ext[seq + 1])
        s_s = np.sqrt(1.0 - acp_ext[seq + 1])
        a_t = np.sqrt(acp_ext[seq_next + 1])
        s_t = np.sqrt(1.0 - acp_ext[seq_next + 1])
        with np.errstate(divide="ignore"):
            lam = np.log(a_s) - np.log(s_s)
            lam_t = np.where(
                s_t > 0.0, np.log(a_t) - np.log(np.maximum(s_t, 1e-300)), np.inf
            )
        h = lam_t - lam  # [M]; h[i] spans predictor step i

        K = self.solver_order
        op = np.zeros(M, np.int64)  # predictor order per step (warm-up/warm-down)
        for i in range(M):
            o = min(K, i + 1)
            if self.lower_order_final:
                o = min(o, M - i)
            if not np.isfinite(h[i]):
                o = 1  # data endpoint: order-1 is exact
            op[i] = max(1, o)
        oc = np.zeros(M, np.int64)  # corrector order = previous predictor order
        if self.use_corrector:
            oc[1:] = op[:-1]

        z = lambda: np.zeros(M, np.float64)
        p_cx, p_cm, pw0, pw1 = s_t / s_s, z(), z(), z()
        c_cx, c_cm, cw0, cw1, cwt, g = z(), z(), z(), z(), z(), z()

        for i in range(M):
            # ---- UniP weights
            o = int(op[i])
            if np.isfinite(h[i]):
                h_phi_1, B_h, b = self._phis(-h[i], o)
                p_cm[i] = -a_t[i] * h_phi_1
                if o > 1:
                    rks = np.asarray(
                        [(lam[i - k] - lam[i]) / h[i] for k in range(1, o)] + [1.0]
                    )
                    if o == 2:
                        rhos = np.asarray([0.5])  # UniPC's fixed order-2 weight
                    else:
                        R = np.stack([np.power(rks, r) for r in range(o)])
                        rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
                    pw = [-a_t[i] * B_h * rhos[k - 1] / rks[k - 1] for k in range(1, o)]
                    pw0[i] = pw[0]
                    if o > 2:
                        pw1[i] = pw[1]
            else:
                p_cm[i] = a_t[i]  # -a_t·expm1(-inf): final step lands on x0
            # ---- UniC weights (corrects the step that arrived at s0)
            o = int(oc[i])
            if o > 0:
                hc = lam[i] - lam[i - 1]
                h_phi_1, B_h, b = self._phis(-hc, o)
                c_cx[i] = s_s[i] / s_s[i - 1]
                c_cm[i] = -a_s[i] * h_phi_1
                rks = np.asarray(
                    [(lam[i - 1 - k] - lam[i - 1]) / hc for k in range(1, o)] + [1.0]
                )
                if o == 1:
                    rhos = np.asarray([0.5])  # trapezoidal correction
                else:
                    R = np.stack([np.power(rks, r) for r in range(o)])
                    rhos = np.linalg.solve(R, b)
                cw = [-a_s[i] * B_h * rhos[k - 1] / rks[k - 1] for k in range(1, o)]
                if o > 1:
                    cw0[i] = cw[0]
                if o > 2:
                    cw1[i] = cw[1]
                cwt[i] = -a_s[i] * B_h * rhos[-1]
                g[i] = 1.0

        f32 = lambda v: v.astype(np.float32)
        return {
            "t": f32(seq.astype(np.float64)),
            "alpha_s": f32(a_s),
            "sigma_s": f32(s_s),
            "p_cx": f32(p_cx),
            "p_cm": f32(p_cm),
            "pw0": f32(pw0),
            "pw1": f32(pw1),
            "c_cx": f32(c_cx),
            "c_cm": f32(c_cm),
            "cw0": f32(cw0),
            "cw1": f32(cw1),
            "cwt": f32(cwt),
            "g": f32(g),
        }

    # ---- sampling --------------------------------------------------------------
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
        del num_steps  # grid is controlled by solver_steps/time_spacing
        B = shape[0]
        coefs = {k: jnp.asarray(v) for k, v in self._unipc_coefficients().items()}
        M = int(coefs["t"].shape[0])

        key, init_key = jax.random.split(key)
        if img is None:
            img = jax.random.normal(init_key, shape, dtype=jnp.float32)

        def step(carry, cs):
            x, x_last, m1, m2, m3 = carry
            raw = model_fn(params, x.reshape(shape), batched_t(cs["t"], x))
            raw = raw.reshape(x.shape)
            if self.objective == "pred_noise":
                m0 = (x - cs["sigma_s"] * raw) / cs["alpha_s"]
            elif self.objective == "pred_v":
                m0 = cs["alpha_s"] * x - cs["sigma_s"] * raw
            else:
                m0 = raw
            if self.clip_denoised:
                m0 = jnp.clip(m0, -1.0, 1.0)
            # UniC: refine the sample the model was just evaluated at
            # (the evaluation itself stays at the uncorrected point — the
            # NFE-preserving mode of the UniPC paper).
            x_corr = (
                cs["c_cx"] * x_last
                + cs["c_cm"] * m1
                + cs["cw0"] * (m2 - m1)
                + cs["cw1"] * (m3 - m1)
                + cs["cwt"] * (m0 - m1)
            )
            x_used = jnp.where(cs["g"] > 0, x_corr, x)
            # UniP: multistep step to the next grid time
            x_next = (
                cs["p_cx"] * x_used
                + cs["p_cm"] * m0
                + cs["pw0"] * (m1 - m0)
                + cs["pw1"] * (m2 - m0)
            )
            y = (x_next + 1.0) * 0.5 if return_frames else None
            return (x_next, x_used, m0, m1, m2), y

        flat = img.reshape(B, -1)
        zeros = jnp.zeros_like(flat)
        (flat, _, _, _, _), frames = jax.lax.scan(
            step, (flat, zeros, zeros, zeros, zeros), coefs
        )
        img = flat.reshape(shape)
        out = (img + 1.0) * 0.5 if unnormalize else img
        if return_frames:
            return out, frames.reshape((M,) + tuple(shape))
        return out
