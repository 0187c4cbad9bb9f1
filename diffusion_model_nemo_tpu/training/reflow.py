"""Reflow / rectification for flow-matching models (Liu et al. 2022,
arXiv:2209.03003 §3).

A flow trained on the independent coupling (x0 ~ data, eps ~ N(0, I)) has
curved ODE trajectories — coarse Euler grids pay for that curvature. Reflow
replaces the coupling with the model's OWN transport: draw z ~ N(0, I),
integrate the current flow z -> x, and retrain on the pair (x, z)

    x_t = (1 - t) x + t z,        target  v = z - x.

Each round provably straightens the transport (the "k-rectified flow");
after one round a SINGLE Euler step approximates the teacher's full ODE —
the flow-matching counterpart of progressive/consistency distillation
(training/distillation.py, training/consistency.py), sharing their driver
conventions.

TPU design: the pair generation and the student update are ONE jitted
dispatch — the teacher's whole ODE scan (stop-gradient), the path point,
the student call and the AdamW update fuse into a single device program
with donated student/opt buffers. No sample buffer ever lands on the host.
With ``mesh=`` the latent batch is sharded over the ``data`` axis
(put_global_batch) and XLA SPMD partitions teacher scan + reductions.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import logging

__all__ = ["ReflowTrainer"]


class ReflowTrainer:
    """Rectify a trained :class:`~...models.rectified_flow.RectifiedFlow`.

    Args:
        model: trained RectifiedFlow (its params are the stage-1 teacher).
        pair_steps: ODE grid size for generating the (z, x) couplings
            (defaults to the model's ``sample_steps``).
        learning_rate / weight_decay / grad_clip: student optimizer.
        mesh: optional ``jax.sharding.Mesh`` — shards each latent batch over
            the ``data`` axis (params replicated, SPMD reductions).
    """

    def __init__(
        self,
        model,
        pair_steps: Optional[int] = None,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        mesh=None,
    ):
        self.model = model
        self.sampler = model.sampler
        self.pair_steps = int(pair_steps) if pair_steps else int(self.sampler.sample_steps)
        self.mesh = mesh
        self._tx = optax.chain(
            optax.clip_by_global_norm(float(grad_clip)),
            optax.adamw(float(learning_rate), weight_decay=float(weight_decay)),
        )
        self._step = None

    # ---- fused generate+update step ------------------------------------------------
    def _build_step(self):
        model = self.model
        sampler = self.sampler
        pair_steps = self.pair_steps
        tx = self._tx

        def loss_fn(student_params, teacher_params, z, key):
            model_fn = model.get_model_fn(training=False)
            # the coupling: integrate the CURRENT flow z -> x (data space)
            x = sampler.p_sample_loop(
                model_fn, teacher_params, z.shape, key, img=z,
                num_steps=pair_steps, unnormalize=False,
            )
            x = jax.lax.stop_gradient(x)
            k_t = jax.random.fold_in(key, 1)
            t = sampler.sample_times(k_t, z.shape[0])
            # the pair's path reuses z as the noise endpoint — that is the
            # whole point of reflow (a deterministic coupling, not a fresh eps)
            x_t = sampler.q_sample(x_start=x, t=t, noise=z)
            out = model_fn(student_params, x_t, sampler.model_time(t))
            target = sampler.v_target(x, z)
            return jnp.mean((out - target) ** 2)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(student_params, opt_state, teacher_params, z, key):
            loss, grads = jax.value_and_grad(loss_fn)(
                student_params, teacher_params, z, key
            )
            updates, opt_state = tx.update(grads, opt_state, student_params)
            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt_state, loss

        return step

    # ---- driver -----------------------------------------------------------------------
    def reflow(
        self,
        steps: int,
        batch_size: int,
        key: jax.Array,
        rounds: int = 1,
        log_every: int = 50,
    ) -> Tuple[Any, list]:
        """Run ``rounds`` rectification rounds of ``steps`` updates each;
        round k's teacher is round k-1's student (the k-rectified flow).
        Returns (student_params, losses)."""
        if self._step is None:
            self._step = self._build_step()
        shape = (
            int(batch_size),
            int(self.model.image_size),
            int(self.model.image_size),
            int(self.model.channels),
        )
        teacher_params = self.model.params
        if self.mesh is not None:
            from ..parallel.sharding import param_shardings_for_strategy

            p_shard = param_shardings_for_strategy(teacher_params, self.mesh, "ddp")
            teacher_params = jax.device_put(teacher_params, p_shard)

        rng = np.random.default_rng(int(jax.random.key_data(key).ravel()[-1]))
        losses: list = []
        for r in range(int(rounds)):
            # copy-then-place: student is donated (CLAUDE.md invariant)
            student_params = jax.tree.map(jnp.copy, teacher_params)
            if self.mesh is not None:
                from ..parallel.sharding import param_shardings_for_strategy

                p_shard = param_shardings_for_strategy(student_params, self.mesh, "ddp")
                student_params = jax.device_put(student_params, p_shard)
                opt_shard = param_shardings_for_strategy(
                    jax.eval_shape(self._tx.init, student_params), self.mesh, "ddp"
                )
                opt_state = jax.jit(self._tx.init, out_shardings=opt_shard)(student_params)
            else:
                opt_state = self._tx.init(student_params)
            for i in range(int(steps)):
                key, sub = jax.random.split(key)
                z = rng.standard_normal(shape).astype(np.float32)
                if self.mesh is not None:
                    from ..parallel.mesh import put_global_batch

                    z = put_global_batch(self.mesh, z)
                else:
                    z = jnp.asarray(z)
                student_params, opt_state, loss = self._step(
                    student_params, opt_state, teacher_params, z, sub
                )
                if log_every and (i % log_every == 0 or i == steps - 1):
                    losses.append(float(loss))
                    logging.info(
                        f"[reflow round {r + 1}] step {i}: loss {losses[-1]:.5f}"
                    )
            teacher_params = student_params
        return teacher_params, losses

    # ---- packaging ----------------------------------------------------------------------
    def student_model(self, params, sample_steps: int = 1):
        """Wrap rectified params as a restorable RectifiedFlow whose sampler
        defaults to ``sample_steps`` (1 after one reflow round is the paper's
        headline configuration); sampler-config persistence like the
        distillers' student_model."""
        from ..config.yaml_config import from_dict
        from ..models import RectifiedFlow

        cfg = copy.deepcopy(from_dict(self.model.cfg))
        cfg["sampler"]["sample_steps"] = int(sample_steps)
        student = RectifiedFlow(cfg=cfg)
        student.params = jax.tree.map(jnp.asarray, params)
        student.ema_params = jax.tree.map(jnp.copy, student.params)
        return student
