"""Consistency distillation — Song et al. 2023 (arXiv:2303.01469).

Beyond the reference's surface, complementing progressive distillation
(training/distillation.py): instead of halving step counts phase by phase,
one training run teaches a student the full ODE-jump-to-data map
f(x^, sigma) -> x0, enabling 1-step (or few-step) generation.

Recipe (CD, Algorithm 2): draw data x0 and a grid transition sigma_lo <
sigma_hi; noise to x^_hi = x0 + sigma_hi * z (EDM's variance-exploding view
of the model's own discrete schedule — modules/karras_diffusion.py); take ONE
teacher Heun step down to sigma_lo; regress the student's consistency head at
(x^_hi, sigma_hi) onto the EMA target network's head at the teacher's
(x^_lo, sigma_lo). The head's boundary f(x^, sigma_min) == x^ holds by
construction (modules/consistency_sampler.py), so the fixed point is the ODE
solution map.

TPU design notes:
  - One jitted step fuses the two teacher evals, the target-net eval, the
    student forward/backward, the AdamW update AND the EMA target update —
    five network calls + one backward per device dispatch; student params,
    target params and optimizer state are donated.
  - Per-sample grid levels are [B] gathers from tiny [N] host-precomputed
    tables (sigma / conditioning-t / VP input scale) — the only gathers in
    the step.
  - The teacher runs through predict_eps_x0 (training/distillation.py), so
    any eps/x0/v teacher works unchanged; x^ <-> x_t conversions are exact.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hf_vision_data import preprocess_batch
from ..modules.consistency_sampler import ConsistencySampler
from ..utils import logging
from .distillation import predict_eps_x0

__all__ = ["ConsistencyDistiller"]


def _col(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """[B] -> [B, 1, ...] column for image-shaped broadcasting."""
    return v.reshape((-1,) + (1,) * (ndim - 1))


class ConsistencyDistiller:
    """Drives consistency distillation over a DDPM-family teacher.

    Args:
        model: a trained DDPM-family model (its ``params`` are the teacher).
        grid_steps: N discretization levels of the consistency grid
            (Karras rho-spacing over the teacher's schedule).
        sigma_data: data std for the head's c_skip/c_out coefficients.
        ema_decay: mu for the target network (theta^- <- mu theta^- +
            (1-mu) theta after every step; 0 ties target to student).
        loss: ``l2`` or ``pseudo_huber`` (sqrt(d^2 + c^2) - c with the
            improved-CT c = 0.00054*sqrt(D), robust at small batch).
        teacher_order: 2 = one Heun step per transition (paper), 1 = Euler.
        mode: ``distill`` (CD, Algorithm 2 — the adjacent point comes from
            one teacher ODE step) or ``train`` (CT, Algorithm 3 — the
            adjacent point is the data re-noised with the SAME z at the
            lower level; no teacher network call, so it also works from a
            random init).
        mesh: optional ``jax.sharding.Mesh`` — runs the fused step data-
            parallel over the mesh's ``data`` axis (params/target/optimizer
            replicated, batches sharded via the multi-host-correct
            ``put_global_batch``; XLA SPMD inserts the gradient reductions).
    """

    def __init__(
        self,
        model,
        grid_steps: int = 18,
        rho: float = 7.0,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        sigma_data: float = 0.5,
        ema_decay: float = 0.95,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        loss: str = "l2",
        teacher_order: int = 2,
        mode: str = "distill",
        mesh=None,
    ):
        if loss not in ("l2", "pseudo_huber"):
            raise ValueError(f"unknown loss {loss!r}")
        if teacher_order not in (1, 2):
            raise ValueError(f"teacher_order must be 1 or 2, got {teacher_order}")
        if grid_steps < 2:
            raise ValueError(f"grid_steps must be >= 2, got {grid_steps}")
        if mode not in ("distill", "train"):
            raise ValueError(f"mode must be distill|train, got {mode!r}")
        self.mode = mode
        self.mesh = mesh
        self.model = model
        self.timesteps = int(model.timesteps)
        self.teacher_objective = str(model.sampler.objective)
        self.grid_steps = int(grid_steps)
        self.rho = float(rho)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.sigma_data = float(sigma_data)
        self.ema_decay = float(ema_decay)
        self.loss = loss
        self.teacher_order = int(teacher_order)

        # The student's sampler doubles as the head: same c_skip/c_out and
        # conditioning the packaged sampler will use. Training regresses the
        # raw head (no clip — CM clips only at sampling time).
        self._head = self._make_sampler(sample_steps=1)
        self._head.clip_denoised = False

        self._tx = optax.chain(
            optax.clip_by_global_norm(float(grad_clip)),
            optax.adamw(float(learning_rate), weight_decay=float(weight_decay)),
        )
        self._step = None

    def _make_sampler(self, sample_steps: int) -> ConsistencySampler:
        scfg = self.model.cfg.get("sampler", {})
        return ConsistencySampler(
            timesteps=self.timesteps,
            schedule_name=scfg.get("schedule_name", "linear"),
            schedule_cfg=scfg.get("schedule_cfg"),
            objective=self.teacher_objective,
            sample_steps=sample_steps,
            sigma_data=self.sigma_data,
            rho=self.rho,
            sigma_min=self.sigma_min,
            sigma_max=self.sigma_max,
        )

    # The ConsistencySampler's own Karras grid uses solver_steps =
    # sample_steps+1; for the TRAINING grid we want grid_steps levels, so
    # override the sigma grid via a dedicated helper sampler.
    def _grid_tables(self) -> Tuple[np.ndarray, np.ndarray]:
        from ..modules.karras_diffusion import KarrasDiffusion

        scfg = self.model.cfg.get("sampler", {})
        kd = KarrasDiffusion(
            timesteps=self.timesteps,
            schedule_name=scfg.get("schedule_name", "linear"),
            schedule_cfg=scfg.get("schedule_cfg"),
            solver_steps=self.grid_steps,
            grid="karras",
            rho=self.rho,
            sigma_min=self.sigma_min,
            sigma_max=self.sigma_max,
        )
        sig, t_cond = kd._sigma_grid()
        return np.asarray(sig[:-1], np.float64), np.asarray(t_cond[:-1], np.float64)

    # ---- teacher ODE step ---------------------------------------------------------
    def teacher_heun_step(
        self,
        teacher_fn,
        teacher_params,
        xhat_hi: jnp.ndarray,
        sig_hi: jnp.ndarray,
        t_hi: jnp.ndarray,
        sig_lo: jnp.ndarray,
        t_lo: jnp.ndarray,
    ) -> jnp.ndarray:
        """One per-sample Heun (or Euler) step sigma_hi -> sigma_lo in x^
        coordinates. ``sig_*``/``t_*`` are [B]; exposed for the closed-form
        anchor in tests/test_consistency.py."""
        ndim = xhat_hi.ndim
        objective = self.teacher_objective

        def slope(xhat, sig, t):
            a = 1.0 / jnp.sqrt(1.0 + sig * sig)
            out = teacher_fn(teacher_params, _col(a, ndim) * xhat, t.astype(jnp.float32))
            if out.shape[-1] != xhat.shape[-1]:  # learned-variance nets
                out, _ = jnp.split(out, 2, axis=-1)
            _, x0 = predict_eps_x0(
                objective, out, _col(a, ndim) * xhat, _col(a, ndim), _col(sig * a, ndim)
            )
            x0 = jnp.clip(x0, -1.0, 1.0)
            return (xhat - x0) / _col(sig, ndim)

        dt = _col(sig_lo - sig_hi, ndim)
        d1 = slope(xhat_hi, sig_hi, t_hi)
        x_e = xhat_hi + dt * d1
        if self.teacher_order == 1:
            return x_e
        d2 = slope(x_e, sig_lo, t_lo)
        return xhat_hi + dt * 0.5 * (d1 + d2)

    # ---- fused CD step --------------------------------------------------------------
    def _build_step(self):
        model = self.model
        head = self._head
        sig_tab, t_tab = self._grid_tables()
        sig_j = jnp.asarray(sig_tab, jnp.float32)
        t_j = jnp.asarray(t_tab, jnp.float32)
        N = self.grid_steps
        tx = self._tx
        mu = self.ema_decay
        loss_kind = self.loss
        ct_mode = self.mode == "train"

        def loss_fn(student_params, target_params, teacher_params, proc, n, z):
            x0_data = proc["pixel_values"]
            ndim = x0_data.ndim
            sig_hi = jnp.take(sig_j, n)
            sig_lo = jnp.take(sig_j, n + 1)
            t_hi = jnp.take(t_j, n)
            t_lo = jnp.take(t_j, n + 1)

            xhat_hi = x0_data + _col(sig_hi, ndim) * z
            teacher_fn = model.get_model_fn(proc, training=False)
            if ct_mode:
                # CT: the adjacent trajectory point is the data itself
                # re-noised with the SAME z — an unbiased one-sample estimate
                # of the ODE step, no teacher evaluation.
                xhat_lo = x0_data + _col(sig_lo, ndim) * z
            else:
                xhat_lo = self.teacher_heun_step(
                    teacher_fn, teacher_params, xhat_hi, sig_hi, t_hi, sig_lo, t_lo
                )
            f_tgt = head.consistency_fn(
                teacher_fn, target_params, xhat_lo, _col(sig_lo, ndim), t_lo
            )
            f_tgt = jax.lax.stop_gradient(f_tgt)
            f_stu = head.consistency_fn(
                teacher_fn, student_params, xhat_hi, _col(sig_hi, ndim), t_hi
            )
            if loss_kind == "pseudo_huber":
                D = float(np.prod(x0_data.shape[1:]))
                c = 0.00054 * np.sqrt(D)
                per = jnp.sqrt(
                    jnp.sum((f_stu - f_tgt) ** 2, axis=tuple(range(1, ndim))) + c * c
                ) - c
                return jnp.mean(per)
            return jnp.mean((f_stu - f_tgt) ** 2)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(student_params, target_params, opt_state, teacher_params, batch, key):
            k_pre, k_n, k_z = jax.random.split(key, 3)
            proc = preprocess_batch(batch, k_pre, train=True)
            x0_data = proc["pixel_values"]
            B = x0_data.shape[0]
            n = jax.random.randint(k_n, (B,), 0, N - 1, dtype=jnp.int32)
            z = jax.random.normal(k_z, x0_data.shape, x0_data.dtype)
            loss, grads = jax.value_and_grad(loss_fn)(
                student_params, target_params, teacher_params, proc, n, z
            )
            updates, opt_state = tx.update(grads, opt_state, student_params)
            student_params = optax.apply_updates(student_params, updates)
            target_params = jax.tree.map(
                lambda tp, sp: mu * tp + (1.0 - mu) * sp, target_params, student_params
            )
            return student_params, target_params, opt_state, loss

        return step

    # ---- driver ----------------------------------------------------------------------
    def distill(
        self,
        batches: Iterator,
        steps: int,
        key,
        log_every: int = 50,
    ) -> Tuple[Any, list]:
        """Run CD for ``steps`` updates. Student and target both initialize
        from the teacher (the paper's recipe). Returns (student_params,
        loss log)."""
        if self._step is None:
            self._step = self._build_step()
        teacher_params = self.model.params
        if self.mesh is not None:
            from ..parallel.sharding import param_shardings_for_strategy

            p_shard = param_shardings_for_strategy(teacher_params, self.mesh, "ddp")
            # copy-then-place: device_put may alias an already-matching leaf,
            # and student/target are donated (CLAUDE.md invariant)
            teacher_params = jax.device_put(teacher_params, p_shard)
            student_params = jax.device_put(
                jax.tree.map(jnp.copy, teacher_params), p_shard
            )
            target_params = jax.device_put(
                jax.tree.map(jnp.copy, teacher_params), p_shard
            )
            opt_shard = param_shardings_for_strategy(
                jax.eval_shape(self._tx.init, student_params), self.mesh, "ddp"
            )
            opt_state = jax.jit(self._tx.init, out_shardings=opt_shard)(student_params)
        else:
            student_params = jax.tree.map(jnp.copy, teacher_params)
            target_params = jax.tree.map(jnp.copy, teacher_params)
            opt_state = self._tx.init(student_params)
        losses = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            batch = next(batches)
            if self.mesh is not None:
                from ..parallel.mesh import put_global_batch

                batch = put_global_batch(self.mesh, batch)
            student_params, target_params, opt_state, loss = self._step(
                student_params, target_params, opt_state, teacher_params, batch, sub
            )
            if log_every and (i % log_every == 0 or i == steps - 1):
                losses.append(float(loss))
                logging.info(f"[consistency] step {i}: loss {losses[-1]:.5f}")
        return student_params, losses

    # ---- packaging --------------------------------------------------------------------
    def student_model(self, params, sample_steps: int = 1):
        """Wrap CD params as a restorable model whose sampler is the
        consistency sampler at ``sample_steps`` NFE (sampler-config
        persistence, like ProgressiveDistiller.student_model)."""
        import copy

        from ..config.yaml_config import from_dict

        cfg = copy.deepcopy(from_dict(self.model.cfg))
        sampler_cfg = dict(cfg.get("sampler", {}))
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.ConsistencySampler"
        sampler_cfg["sample_steps"] = int(sample_steps)
        sampler_cfg["sigma_data"] = self.sigma_data
        sampler_cfg["rho"] = self.rho
        if self.sigma_min is not None:
            sampler_cfg["sigma_min"] = float(self.sigma_min)
        if self.sigma_max is not None:
            sampler_cfg["sigma_max"] = float(self.sigma_max)
        sampler_cfg["objective"] = self.teacher_objective
        for k in ("eta", "ddim_timesteps", "solver_steps", "solver_order", "time_spacing"):
            sampler_cfg.pop(k, None)
        cfg["sampler"] = sampler_cfg
        student = type(self.model)(cfg=cfg)
        student.params = params
        student.ema_params = jax.tree.map(jnp.copy, params)
        return student
