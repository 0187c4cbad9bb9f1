"""Progressive distillation of DDPM-family teachers into few-step DDIM
students (Salimans & Ho 2022, arXiv:2202.00512).

Beyond the reference's surface (its fastest path is strided DDIM,
generalized_gaussian_diffusion.py): each phase teaches a student to match
TWO deterministic teacher DDIM half-steps with ONE of its own, halving the
sampling step count; phases compose 1000 → 500 → … → N steps. Combined with
the v-parameterization (``objective: pred_v``) the student stays
well-conditioned down to very few steps — the standard production recipe for
fast high-quality sampling.

TPU design notes:
  - One jitted step carries the two teacher evaluations AND the student
    update — three network calls fused into a single device dispatch, student
    params + optimizer state donated, teacher params resident (never copied).
  - All schedule scalars are gathers from the extended-ᾱ table ([T+1] in
    HBM); the distillation target is closed-form elementwise math, so the
    step costs exactly 3 U-Net calls + one backward.
  - The teacher runs in eval mode (no dropout); the student trains with the
    model's configured dropout under an explicit key.

Grid convention matches GeneralizedGaussianDiffusion._strided_sequences: the
student's N-step DDIM visits t ∈ {0, s, 2s, …, T−s} (s = T/N) and steps
t → t−s, ending with 0 → −1 (ᾱ=1 data endpoint). The teacher's 2N-step grid
shares every student point plus the midpoints t−s/2; the shared final step
0 → −1 makes the t=0 target simply the teacher's own x̂₀ (handled by a
``where``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hf_vision_data import preprocess_batch
from ..utils import logging

__all__ = ["ProgressiveDistiller", "predict_eps_x0"]


def _bcast_gather(table: jnp.ndarray, idx: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[idx] broadcast to an [B, 1, …] column for image math."""
    return jnp.take(table, idx).reshape((-1,) + (1,) * (ndim - 1))


def predict_eps_x0(
    objective: str, out: jnp.ndarray, x: jnp.ndarray, alpha: jnp.ndarray, sigma: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (ε̂, x̂₀) pair from a network output under any objective.

    ``alpha``/``sigma`` are √ᾱ and √(1−ᾱ) at the output's conditioning time
    (extended grid). The three parameterizations are linear bijections of
    each other given (x, t) — see gaussian_diffusion.py's v helpers.
    """
    if objective == "pred_noise":
        eps = out
        x0 = (x - sigma * eps) / alpha
    elif objective == "pred_v":
        x0 = alpha * x - sigma * out
        eps = sigma * x + alpha * out
    elif objective == "pred_x0":
        x0 = out
        eps = (x - alpha * x0) / sigma
    else:
        raise ValueError(f"unknown objective {objective!r}")
    return eps, x0


class ProgressiveDistiller:
    """Drives progressive distillation phases over a DDPM-family model.

    The model supplies the network (``get_model_fn``), the schedule
    (``sampler.constants``) and the data pipeline; the distiller owns the
    student optimizer and the fused distill step. The student reuses the
    teacher's network topology and is initialized from the teacher's params
    each phase (the paper's recipe).

    Args:
        model: a trained DDPM-family model (its ``params`` are the teacher).
        student_objective: parameterization the student is trained in
            (default ``pred_v`` — recommended; ``None`` keeps the teacher's).
        learning_rate / weight_decay / grad_clip: student AdamW settings.
        loss_weighting: ``truncated_snr`` (paper's max(SNR, 1) on the
            x₀-space error) or ``uniform``.
        guidance_scale: when set (requires a ConditionalDDPM-style teacher
            and labeled batches), the teacher's denoiser is the
            classifier-free-guided combination ε_u + w·(ε_c − ε_u) at this
            fixed w — the student absorbs guidance into a SINGLE network
            call (stage 1 of Meng et al. 2023, arXiv:2210.03142), halving
            the per-step cost of guided sampling before any step halving.
        mesh: optional ``jax.sharding.Mesh`` — runs the fused step data-
            parallel over the mesh's ``data`` axis (params replicated,
            batches sharded via the multi-host-correct ``put_global_batch``;
            XLA SPMD inserts the gradient reductions).
    """

    def __init__(
        self,
        model,
        student_objective: Optional[str] = "pred_v",
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        loss_weighting: str = "truncated_snr",
        guidance_scale: Optional[float] = None,
        mesh=None,
    ):
        if loss_weighting not in ("truncated_snr", "uniform"):
            raise ValueError(f"unknown loss_weighting {loss_weighting!r}")
        # Label-conditional gate: the guided step calls
        # model._cfg_model_fn(labels, w). TextConditionalDDPM also defines
        # _cfg_model_fn but with a (tokens, null, w) signature, so a bare
        # hasattr gate would admit it and TypeError deep inside the jit.
        if guidance_scale is not None and not (
            hasattr(model, "_cfg_model_fn") and hasattr(model, "num_classes")
        ):
            raise ValueError(
                "guidance_scale requires a class-conditional model"
                " (ConditionalDDPM) as the teacher; text-conditional teachers"
                " are not supported for guided distillation"
            )
        self.guidance_scale = None if guidance_scale is None else float(guidance_scale)
        self.model = model
        self.timesteps = int(model.timesteps)
        self.teacher_objective = str(model.sampler.objective)
        self.student_objective = str(student_objective or self.teacher_objective)
        if self.student_objective not in ("pred_noise", "pred_x0", "pred_v"):
            raise ValueError(f"bad student objective {self.student_objective!r}")
        self.loss_weighting = loss_weighting
        acp = np.asarray(model.sampler.constants.alphas_cumprod, np.float32)
        self._acp_ext = jnp.concatenate([jnp.ones((1,), jnp.float32), jnp.asarray(acp)])
        self.mesh = mesh
        self._tx = optax.chain(
            optax.clip_by_global_norm(float(grad_clip)),
            optax.adamw(float(learning_rate), weight_decay=float(weight_decay)),
        )
        self._step_cache: Dict[Tuple[int, str, int], Any] = {}

    # ---- fused distill step ----------------------------------------------------
    def _build_step(self, stride: int, teacher_objective: str, substeps: int, guided: bool):
        """One jitted update. ``substeps=2`` is a progressive phase (two
        teacher half-steps of ``stride//2``); ``substeps=1`` is direct
        output-space transfer (target = the teacher's own x̂₀ at the same
        (x, t)) — used to re-parameterize an ε-teacher into a v-student
        before the first halving. ``guided`` wraps the teacher in the CFG
        combination at ``self.guidance_scale`` — ONLY the first stage of a
        recipe may be guided: later stages' teachers are earlier students
        that already absorbed w, and re-wrapping them compounds guidance
        (w² by the second stage)."""
        model = self.model
        acp_ext = self._acp_ext
        T = self.timesteps
        n_grid = T // stride
        tx = self._tx
        student_objective = self.student_objective
        weighting = self.loss_weighting
        guidance_scale = self.guidance_scale if guided else None
        if guided and guidance_scale is None:
            raise ValueError("guided step requested but no guidance_scale was set")

        def teacher_eps_x0(teacher_fn, teacher_params, xi, ti, ndim):
            out = teacher_fn(teacher_params, xi, ti)
            if out.shape != xi.shape:  # learned-variance nets emit 2C channels
                out, _ = jnp.split(out, 2, axis=-1)
            a = _bcast_gather(acp_ext, ti + 1, ndim)
            eps, x0 = predict_eps_x0(teacher_objective, out, xi, jnp.sqrt(a), jnp.sqrt(1.0 - a))
            # mirror ddim_step: x̂₀ clipped to the data range, ε̂ raw
            return eps, jnp.clip(x0, -1.0, 1.0)

        def loss_fn(student_params, teacher_params, proc, t, eps):
            x0_data = proc["pixel_values"]
            ndim = x0_data.ndim
            a_t = _bcast_gather(acp_ext, t + 1, ndim)
            al_t, sg_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
            x = al_t * x0_data + sg_t * eps

            if guidance_scale is not None:
                # guided teacher: the student absorbs the 2-call CFG
                # combination at fixed w into its single conditional call
                labels = proc["label"].astype(jnp.int32)
                teacher_fn = model._cfg_model_fn(labels, guidance_scale)
            else:
                teacher_fn = model.get_model_fn(proc, training=False)
            eps1, x01 = teacher_eps_x0(teacher_fn, teacher_params, x, t, ndim)

            if substeps == 2:
                m = jnp.maximum(t - stride // 2, 0)
                n = jnp.maximum(t - stride, -1)
                a_m = _bcast_gather(acp_ext, m + 1, ndim)
                a_n = _bcast_gather(acp_ext, n + 1, ndim)
                al_m, sg_m = jnp.sqrt(a_m), jnp.sqrt(1.0 - a_m)
                al_n, sg_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)
                x_m = al_m * x01 + sg_m * eps1
                eps2, x02 = teacher_eps_x0(teacher_fn, teacher_params, x_m, m, ndim)
                z = al_n * x02 + sg_n * eps2
                # solve one student DDIM step x→z for the implied x̂₀
                ratio = sg_n / sg_t
                x0_tgt = (z - ratio * x) / (al_n - ratio * al_t)
                # the 0 → −1 step is shared between grids: target = teacher x̂₀
                x0_tgt = jnp.where((t == 0).reshape((-1,) + (1,) * (ndim - 1)), x01, x0_tgt)
            else:
                x0_tgt = x01
            x0_tgt = jax.lax.stop_gradient(x0_tgt)

            # Both networks run deterministically (training=False): the
            # student must match the teacher under IDENTICAL conditioning —
            # ConditionalDDPM's training mode would null-mask 50% of the
            # labels the teacher saw unmasked, and dropout would add noise to
            # a deterministic regression target.
            student_fn = model.get_model_fn(proc, training=False)
            out_s = student_fn(student_params, x, t)
            if out_s.shape != x.shape:  # learned-variance nets emit 2C channels
                out_s, _ = jnp.split(out_s, 2, axis=-1)
            _, x0_s = predict_eps_x0(student_objective, out_s, x, al_t, sg_t)

            err = (x0_s - x0_tgt) ** 2
            if weighting == "truncated_snr":
                w = jnp.maximum(a_t / (1.0 - a_t), 1.0)
                err = w * err
            return jnp.mean(err)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(student_params, opt_state, teacher_params, batch, key):
            k_pre, k_t, k_eps = jax.random.split(key, 3)
            proc = preprocess_batch(batch, k_pre, train=True)
            x0_data = proc["pixel_values"]
            B = x0_data.shape[0]
            if substeps == 2:
                t = jax.random.randint(k_t, (B,), 0, n_grid, dtype=jnp.int32) * stride
            else:
                t = jax.random.randint(k_t, (B,), 0, T, dtype=jnp.int32)
            eps = jax.random.normal(k_eps, x0_data.shape, x0_data.dtype)
            loss, grads = jax.value_and_grad(loss_fn)(
                student_params, teacher_params, proc, t, eps
            )
            updates, opt_state = tx.update(grads, opt_state, student_params)
            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt_state, loss

        return step

    def _get_step(self, stride: int, teacher_objective: str, substeps: int, guided: bool = False):
        key = (stride, teacher_objective, substeps, guided)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(stride, teacher_objective, substeps, guided)
        return self._step_cache[key]

    # ---- phase drivers -----------------------------------------------------------
    def _run(self, step_fn, teacher_params, batches, steps, key, log_every, tag):
        if self.mesh is not None:
            from ..parallel.sharding import param_shardings_for_strategy

            p_shard = param_shardings_for_strategy(teacher_params, self.mesh, "ddp")
            # copy-then-place: device_put may alias an already-matching leaf,
            # and the student is donated (CLAUDE.md invariant)
            teacher_params = jax.device_put(teacher_params, p_shard)
            student_params = jax.device_put(
                jax.tree.map(jnp.copy, teacher_params), p_shard
            )
            opt_shard = param_shardings_for_strategy(
                jax.eval_shape(self._tx.init, student_params), self.mesh, "ddp"
            )
            opt_state = jax.jit(self._tx.init, out_shardings=opt_shard)(student_params)
        else:
            student_params = jax.tree.map(jnp.copy, teacher_params)
            opt_state = self._tx.init(student_params)
        losses = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            batch = next(batches)
            if self.mesh is not None:
                from ..parallel.mesh import put_global_batch

                batch = put_global_batch(self.mesh, batch)
            student_params, opt_state, loss = step_fn(
                student_params, opt_state, teacher_params, batch, sub
            )
            if log_every and (i % log_every == 0 or i == steps - 1):
                losses.append(float(loss))
                logging.info(f"[distill {tag}] step {i}: loss {losses[-1]:.5f}")
        return student_params, losses

    def transfer_objective(
        self, batches: Iterator, steps: int, key, log_every: int = 50, guided: Optional[bool] = None
    ):
        """Re-parameterize the teacher into ``student_objective`` (direct
        output-space regression; no step-count change). When the distiller
        has a ``guidance_scale`` this stage ALSO absorbs the guidance (it
        always regresses the original teacher). Returns new params."""
        guided = (self.guidance_scale is not None) if guided is None else bool(guided)
        step_fn = self._get_step(
            stride=1, teacher_objective=self.teacher_objective, substeps=1, guided=guided
        )
        params, losses = self._run(
            step_fn, self.model.params, batches, steps, key, log_every, "transfer"
        )
        return params, losses

    def distill_phase(
        self,
        teacher_params,
        teacher_objective: str,
        student_steps: int,
        batches: Iterator,
        steps: int,
        key,
        log_every: int = 50,
        guided: bool = False,
    ):
        """One halving phase: teacher at 2·student_steps → student at
        ``student_steps``. Requires T % student_steps == 0 with an even
        stride (so the teacher midpoint is on-grid). Set ``guided=True``
        ONLY when ``teacher_params`` is the original guidance-trained
        teacher (never a previous phase's student — guidance compounds)."""
        T = self.timesteps
        if student_steps <= 0 or T % student_steps != 0:
            raise ValueError(f"student_steps must divide timesteps={T}, got {student_steps}")
        stride = T // student_steps
        if stride % 2 != 0:
            raise ValueError(
                f"stride {stride} (= {T}/{student_steps}) must be even so the"
                " teacher midpoint lies on the discrete grid"
            )
        step_fn = self._get_step(stride, teacher_objective, substeps=2, guided=guided)
        return self._run(
            step_fn, teacher_params, batches, steps, key, log_every, f"N={student_steps}"
        )

    def distill(
        self,
        batches: Iterator,
        final_steps: int,
        steps_per_phase: int,
        key,
        transfer_steps: int = 0,
        log_every: int = 50,
    ):
        """Full recipe: optional objective transfer, then halving phases
        T/2, T/4, … down to ``final_steps``. Returns (params, phase log)."""
        T = self.timesteps
        schedule = []
        n = T // 2
        while n >= final_steps and (T % n == 0) and ((T // n) % 2 == 0):
            schedule.append(n)
            if n == final_steps:
                break
            n //= 2
        if not schedule or schedule[-1] != final_steps:
            raise ValueError(
                f"final_steps={final_steps} is not reachable by halving from"
                f" timesteps={T} (reachable: {schedule})"
            )

        teacher_params = self.model.params
        teacher_objective = self.teacher_objective
        # Guidance must be absorbed exactly ONCE — by whichever stage still
        # regresses the ORIGINAL teacher. Every later stage's teacher is a
        # student that already emits guided outputs; wrapping it again would
        # compound the scale (w² by the second stage).
        guided_next = self.guidance_scale is not None
        history: Dict[str, Any] = {}
        if self.student_objective != self.teacher_objective:
            if transfer_steps <= 0:
                raise ValueError(
                    "student_objective differs from the teacher's — pass"
                    " transfer_steps > 0 to re-parameterize first"
                )
            key, sub = jax.random.split(key)
            teacher_params, losses = self.transfer_objective(
                batches, transfer_steps, sub, log_every, guided=guided_next
            )
            teacher_objective = self.student_objective
            guided_next = False
            history["transfer"] = losses

        for n in schedule:
            key, sub = jax.random.split(key)
            teacher_params, losses = self.distill_phase(
                teacher_params,
                teacher_objective,
                n,
                batches,
                steps_per_phase,
                sub,
                log_every,
                guided=guided_next,
            )
            teacher_objective = self.student_objective
            guided_next = False
            history[f"N={n}"] = losses
        return teacher_params, history

    # ---- packaging ----------------------------------------------------------------
    def student_model(self, params, student_steps: int):
        """Wrap distilled params as a restorable model whose sampler is the
        N-step deterministic DDIM in the student's parameterization (the
        sampler-config persistence the reference's ``change_sampler``
        provides)."""
        import copy

        from ..config.yaml_config import from_dict

        cfg = copy.deepcopy(from_dict(self.model.cfg))
        sampler_cfg = dict(cfg.get("sampler", {}))
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["objective"] = self.student_objective
        sampler_cfg["eta"] = 0.0
        sampler_cfg["ddim_timesteps"] = int(student_steps)
        sampler_cfg.pop("solver_steps", None)
        cfg["sampler"] = sampler_cfg
        student = type(self.model)(cfg=cfg)
        student.params = params
        student.ema_params = jax.tree.map(jnp.copy, params)
        return student
