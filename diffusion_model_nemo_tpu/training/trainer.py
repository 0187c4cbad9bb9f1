"""Training loop: pjit data-parallel updates over a device mesh.

Replaces the PyTorch-Lightning ``Trainer`` + NeMo ModelPT services the
reference delegates to (SURVEY §1 external runtime): optimizer/schedule from
``model.cfg.optim``, gradient clipping/accumulation, the step/epoch loop,
periodic logging, checkpointing/resume, and the ``trainer.fit/test`` entry
points. Config fields mirror the reference YAML ``trainer`` block
(examples/configs/ddpm/unet_small.yaml:81-96): ``devices``, ``max_epochs``,
``max_steps``, ``accumulate_grad_batches``, ``gradient_clip_val``,
``precision``, ``log_every_n_steps``.

TPU design: one jitted update function; the batch is sharded over the 1-D
``data`` mesh axis and parameters are replicated — XLA inserts the gradient
all-reduce over ICI (no hand-written collectives, no DDP process group).
EMA runs fused inside the same update.
"""

from __future__ import annotations

import itertools
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import put_global_batch
from ..parallel.sharding import make_strategy_mesh, param_shardings_for_strategy
from ..utils import logging
from .ema import ema_update
from .optim import build_optimizer

__all__ = ["Trainer"]


class Trainer:
    def __init__(
        self,
        devices: int = -1,
        num_nodes: int = 1,
        max_epochs: Optional[int] = None,
        max_steps: Optional[int] = None,
        accumulate_grad_batches: int = 1,
        gradient_clip_val: Optional[float] = 1.0,
        precision: Any = 32,
        log_every_n_steps: int = 10,
        ema_decay: float = 0.9999,
        seed: int = 42,
        strategy: Optional[str] = None,  # ddp (default) | fsdp | tensor_parallel | fsdp_tp | expert_parallel
        tp_size: int = 0,  # model/expert-axis size for tensor_parallel/expert_parallel; <=0 = auto
        steps_per_execution: int = 1,  # optimizer steps per device dispatch (lax.scan)
        accelerator: str = "auto",
        limit_test_batches: Optional[float] = None,
        profile_dir: Optional[str] = None,
        profile_start_step: int = 10,
        profile_num_steps: int = 5,
        terminate_on_nan: bool = True,
        compile_cache_dir: Optional[str] = None,
        posthoc_ema_sigma_rels: Optional[Any] = None,  # e.g. [0.05, 0.10] enables post-hoc EMA
        posthoc_ema_every_n_steps: int = 1024,
        posthoc_ema_dir: Optional[str] = None,
        **_unused,
    ):
        if compile_cache_dir:
            from ..utils.compile_cache import enable_persistent_compilation_cache

            enable_persistent_compilation_cache(compile_cache_dir)
        self.terminate_on_nan = bool(terminate_on_nan)
        self.profile_dir = profile_dir
        self.profile_start_step = int(profile_start_step)
        self.profile_num_steps = int(profile_num_steps)
        self.devices = devices
        self.num_nodes = num_nodes
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.accumulate_grad_batches = max(int(accumulate_grad_batches or 1), 1)
        # Multi-step dispatch (the Keras/TF ``steps_per_execution`` analogue):
        # scan K full optimizer steps inside ONE jitted call, so per-dispatch
        # latency (a full tunnel round-trip on remote-TPU rigs) amortizes
        # over K steps. Logging/checkpoint cadences quantize to K-step
        # boundaries. Composes with neither grad-accum (both stack batches on
        # the leading axis) — accum wins if both are set.
        self.steps_per_execution = max(int(steps_per_execution or 1), 1)
        if self.steps_per_execution > 1 and self.accumulate_grad_batches > 1:
            logging.warning(
                "steps_per_execution > 1 is unsupported with "
                "accumulate_grad_batches > 1; running single-step dispatch"
            )
            self.steps_per_execution = 1
        # Post-hoc EMA (Karras 2024 power-function averaging): requires one
        # optimizer step per dispatch so the per-step profile update runs at
        # the right t (the multi-step scan would skip intermediate params).
        self.posthoc_ema_sigma_rels = (
            [float(s) for s in posthoc_ema_sigma_rels] if posthoc_ema_sigma_rels else None
        )
        self.posthoc_ema_every_n_steps = int(posthoc_ema_every_n_steps)
        self.posthoc_ema_dir = posthoc_ema_dir
        if self.posthoc_ema_sigma_rels and self.steps_per_execution > 1:
            logging.warning(
                "posthoc_ema is unsupported with steps_per_execution > 1; disabling it"
            )
            self.posthoc_ema_sigma_rels = None
        self.gradient_clip_val = gradient_clip_val
        self.precision = precision
        self.log_every_n_steps = int(log_every_n_steps)
        self.ema_decay = float(ema_decay)
        self.seed = int(seed)
        self.limit_test_batches = limit_test_batches

        all_devices = jax.devices()
        n = len(all_devices) if int(devices) in (-1, 0) else min(int(devices), len(all_devices))
        # The reference's YAML says ``strategy: ddp`` (PTL DDP over NCCL,
        # examples/configs/ddpm/unet_small.yaml:88); here the strategy picks
        # the mesh topology + parameter layout and XLA SPMD emits the
        # collectives (parallel/sharding.py). Unknown strings (PTL variants
        # like ddp_spawn, ddp_sharded) keep the pre-round config-parity
        # contract: warn and run mesh data-parallel — validated HERE so a
        # typo surfaces at construction, not mid-fit.
        self.strategy = (strategy or "ddp").lower()
        if self.strategy in ("ddp_sharded", "ddp_fully_sharded", "fsdp_native"):
            # PTL's sharded DDP variants imply ZeRO-style memory sharding —
            # the honest mapping here is the fsdp parameter layout, not
            # replication.
            logging.warning(
                f"trainer.strategy={strategy!r} implies sharded parameter/optimizer "
                "memory; mapping to the fsdp mesh layout"
            )
            self.strategy = "fsdp"
        elif self.strategy in ("none", "null", "auto", "dp"):
            self.strategy = "ddp"
        elif self.strategy.startswith("ddp"):
            if self.strategy != "ddp":
                # ddp_spawn / ddp_notebook / ddp_find_unused_parameters_false …
                # are process-launch variants; replication semantics match.
                logging.warning(
                    f"trainer.strategy={strategy!r} is a PTL process-launch variant; "
                    "running mesh data-parallel (replicated params)"
                )
            self.strategy = "ddp"
        if self.strategy not in (
            "ddp", "fsdp", "tensor_parallel", "tp", "fsdp_tp", "expert_parallel", "ep"
        ):
            logging.warning(
                f"trainer.strategy={strategy!r} is not a recognized layout "
                "(ddp | fsdp | tensor_parallel | fsdp_tp | expert_parallel); "
                "using mesh data-parallel"
            )
            self.strategy = "ddp"
        self.mesh = make_strategy_mesh(all_devices[:n], self.strategy, tp_size)
        self.global_step = 0
        self.exp_manager_hooks = None  # set by exp_manager()
        logging.info(
            f"Trainer using {n} device(s): strategy={self.strategy}, "
            f"mesh {dict(self.mesh.shape)}"
        )

    # ------------------------------------------------------------------ fit ----
    def fit(self, model, resume_state: Optional[Dict[str, Any]] = None) -> None:
        if model._train_dl is None and model.cfg.get("train_ds"):
            model.setup_training_data(model.cfg.train_ds)
        train_dl = model._train_dl
        if train_dl is None:
            raise ValueError("No training dataloader configured (model.cfg.train_ds)")
        # Overlap host batch assembly with device steps (background thread).
        from ..data.prefetch import ThreadedPrefetcher

        train_dl = ThreadedPrefetcher(train_dl, depth=2)

        steps_per_epoch = max(len(train_dl) // self.accumulate_grad_batches, 1)
        if self.max_steps:
            max_steps = int(self.max_steps)
        elif self.max_epochs:
            max_steps = steps_per_epoch * int(self.max_epochs)
        else:
            raise ValueError("Either max_steps or max_epochs must be set")

        tx, lr_schedule = build_optimizer(
            model.cfg.get("optim"), max_steps, grad_clip=self.gradient_clip_val
        )

        self._apply_precision(model)
        if model.params is None:
            model.init_params(jax.random.PRNGKey(self.seed))

        # Parameter layout by strategy: replicated (ddp), sharded over data
        # (fsdp), or sharded over the model axis (tensor_parallel). EMA and
        # optimizer state mirror the parameter layout. The opt-state layout
        # must be REQUESTED via out_shardings (inferred from eval_shape with
        # the same strategy rule): tx.init's outputs are data-independent
        # zeros, so without it XLA constant-places them on one device and the
        # update jit later rejects the mixed device sets.
        p_shard = param_shardings_for_strategy(model.params, self.mesh, self.strategy)
        # Copy before placing: device_put may alias (not copy) a leaf whose
        # layout already matches, and the donated update would then delete
        # model.params/model.ema_params themselves (CLAUDE.md invariant).
        params = jax.device_put(jax.tree.map(jnp.copy, model.params), p_shard)
        ema_params = jax.device_put(jax.tree.map(jnp.copy, model.ema_params), p_shard)
        opt_shard = param_shardings_for_strategy(
            jax.eval_shape(tx.init, params), self.mesh, self.strategy
        )
        opt_state = jax.jit(tx.init, out_shardings=opt_shard)(params)
        start_step = 0

        if resume_state is not None:
            params = jax.device_put(resume_state["params"], p_shard)
            ema_params = jax.device_put(resume_state["ema_params"], p_shard)
            # Orbax returns raw nested containers; rebuild the optax state's
            # NamedTuple structure from the freshly-initialized template.
            restored_opt = resume_state["opt_state"]
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state), jax.tree.leaves(restored_opt)
            )
            opt_state = jax.device_put(opt_state, opt_shard)
            start_step = int(resume_state["step"])
            logging.info(f"Resumed training from step {start_step}")

        # Post-hoc EMA: tracked power-function averages live alongside the
        # classic EMA, donated by their own jitted update, snapshotted at a
        # fixed cadence, and carried through checkpoints (bitwise resume).
        phema = None
        phema_state = None
        if self.posthoc_ema_sigma_rels:
            from .posthoc_ema import PostHocEMA

            phema_dir = self.posthoc_ema_dir or (
                str(self.exp_manager_hooks.log_dir / "phema")
                if self.exp_manager_hooks
                else "./phema"
            )
            phema = PostHocEMA(
                phema_dir, self.posthoc_ema_sigma_rels, self.posthoc_ema_every_n_steps
            )
            if resume_state is not None and resume_state.get("phema") is not None:
                phema_state = [
                    jax.device_put(t, p_shard) for t in resume_state["phema"]
                ]
            else:
                phema_state = [
                    jax.device_put(jax.tree.map(jnp.copy, model.params), p_shard)
                    for _ in phema.gammas
                ]
            logging.info(
                f"Post-hoc EMA tracking sigma_rels={phema.sigma_rels} "
                f"(gammas={tuple(round(g, 3) for g in phema.gammas)}), "
                f"snapshots every {phema.every} steps -> {phema.dir}"
            )

        accum = self.accumulate_grad_batches
        spe = self.steps_per_execution
        if spe > 1:
            update_multi, update = self._build_multi_update_fn(model.training_step, tx)
        else:
            update_multi, update = None, self._build_update_fn(model.training_step, tx)
        group = accum if accum > 1 else spe  # batches stacked [group, B, ...]
        stacked = group > 1

        resume_epoch = 0
        if start_step:
            # Deterministic data resume: iteration order is a pure function
            # of (seed, epoch, batch index), so fast-forward the loader to
            # where an uninterrupted run would be at start_step. Combined
            # with the step-derived fold_in key stream in the update fn,
            # a resumed run is bit-identical to a continuous one (the
            # reference restarts PTL's DataLoader from scratch on resume).
            raw_dl = getattr(train_dl, "loader", train_dl)
            if hasattr(raw_dl, "set_position"):
                n_groups = start_step // spe if spe > 1 else start_step
                groups_per_epoch = max(len(raw_dl) // group, 1)
                resume_epoch = n_groups // groups_per_epoch
                raw_dl.set_position(
                    resume_epoch, (n_groups % groups_per_epoch) * group
                )

        base_key = jax.random.PRNGKey(self.seed)
        step = start_step  # host mirror for cadence/logging control flow
        step_dev = jnp.asarray(start_step, jnp.int32)  # carried device scalar
        epoch = resume_epoch
        t_last = time.perf_counter()
        samples_since = 0
        done = False

        logging.info(
            f"Starting training: {max_steps} steps "
            f"({steps_per_epoch} steps/epoch, accum={self.accumulate_grad_batches})"
        )
        while not done:
            for host_batch in self._accumulated(train_dl, group):
                if step >= max_steps:
                    done = True
                    break
                # Optional jax.profiler trace of a step window (aux subsystem).
                if self.profile_dir and step == self.profile_start_step:
                    jax.profiler.start_trace(self.profile_dir)
                if self.profile_dir and step == self.profile_start_step + self.profile_num_steps:
                    jax.profiler.stop_trace()
                    logging.info(f"Profiler trace written to {self.profile_dir}")
                if spe > 1 and step + spe > max_steps:
                    # Tail shorter than the compiled scan: replay the group's
                    # remaining steps through the single-step jit.
                    for i in range(max_steps - step):
                        b = self._put_batch({k: v[i] for k, v in host_batch.items()})
                        params, opt_state, ema_params, step_dev, metrics = update(
                            params, opt_state, ema_params, b, base_key, step_dev
                        )
                    newly = max_steps - step
                elif spe > 1:
                    batch = self._put_batch(host_batch, stacked=True)
                    params, opt_state, ema_params, step_dev, metrics = update_multi(
                        params, opt_state, ema_params, batch, base_key, step_dev
                    )
                    newly = spe
                else:
                    batch = self._put_batch(host_batch, stacked=stacked)
                    params, opt_state, ema_params, step_dev, metrics = update(
                        params, opt_state, ema_params, batch, base_key, step_dev
                    )
                    newly = 1
                if phema is not None:
                    # step_dev is post-increment = completed optimizer steps,
                    # exactly the profile time t the update needs. params are
                    # read (not donated) — the next train update donates them.
                    phema_state = phema.jitted_update()(phema_state, params, step_dev)
                prev_step = step
                step += newly
                if phema is not None:
                    phema.maybe_snapshot(phema_state, step)
                self.global_step = step
                lead = next(iter(host_batch.values())).shape
                samples_since += lead[0] * (lead[1] if stacked else 1)

                def _crossed(cadence: int) -> bool:
                    return cadence > 0 and (step // cadence) > (prev_step // cadence)

                if _crossed(self.log_every_n_steps) or step == max_steps:
                    now = time.perf_counter()
                    # One batched device→host transfer (per-leaf float() would
                    # pay a tunnel round-trip per metric on remote-TPU rigs).
                    host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    # Failure detection (aux subsystem; the reference has
                    # none): halt on non-finite loss instead of silently
                    # corrupting the EMA/checkpoints downstream.
                    if self.terminate_on_nan and not np.isfinite(
                        host_metrics.get("train_loss", 0.0)
                    ):
                        raise FloatingPointError(
                            f"Non-finite train_loss at step {step}: "
                            f"{host_metrics}. Last checkpoint (if any) is "
                            f"intact; resume with a lower LR or grad clip."
                        )
                    host_metrics["learning_rate"] = float(lr_schedule(step))
                    host_metrics["global_step"] = step
                    host_metrics["samples_per_sec"] = samples_since / max(now - t_last, 1e-9)
                    t_last, samples_since = now, 0
                    self._log_metrics(host_metrics, step)

                # Periodic sample dump (+ optional bits/dim), reference
                # ddpm.py:65-75 — uses the freshest params.
                save_every = int(model.save_and_sample_every or 0)
                if save_every and _crossed(save_every):
                    # Hand the model COPIES: the live arrays are donated by
                    # the next update, and the model must stay usable if fit
                    # exits abnormally (e.g. the NaN halt below).
                    model.params = jax.tree.map(jnp.copy, params)
                    model.ema_params = jax.tree.map(jnp.copy, ema_params)
                    imgs = model._save_image_step(batch_size=64, step=step)
                    if imgs is not None and self.exp_manager_hooks:
                        self.exp_manager_hooks.log_images("samples", imgs, step)
                    if model.cfg.get("compute_bpd", False):
                        from ..data.hf_vision_data import preprocess_batch

                        flat = (
                            host_batch if not stacked
                            else {k: v[0] for k, v in host_batch.items()}
                        )
                        proc = preprocess_batch(flat, None, train=False)
                        bpd = model.calculate_bits_per_dimension(proc["pixel_values"])
                        self._log_metrics(
                            {"total_bits_per_dimension": float(bpd["total_bpd"].mean())}, step
                        )

                # Only materialize the monitored loss when this step actually
                # checkpoints: float() blocks on the just-dispatched update,
                # and a per-step device sync (a full tunnel round-trip on the
                # remote-TPU rig) serializes the pipeline — measured 2240 →
                # 8300 samples/sec sustained once removed.
                hooks = self.exp_manager_hooks
                if hooks and hooks.should_checkpoint(step):
                    ckpt_state = {
                        "params": params,
                        "ema_params": ema_params,
                        "opt_state": opt_state,
                        "step": step,
                    }
                    if phema_state is not None:
                        ckpt_state["phema"] = phema_state
                    hooks.maybe_checkpoint(
                        step,
                        ckpt_state,
                        metrics={"train_loss": float(metrics.get("train_loss", 0.0))},
                    )
            epoch += 1
            if self.max_epochs and epoch >= int(self.max_epochs) and not self.max_steps:
                done = True

        model.params = params
        model.ema_params = ema_params
        if phema is not None and step > start_step:
            # Always capture the final profile time: the reconstruction
            # target t_r defaults to the latest snapshot.
            phema.snapshot(phema_state, step)
        if self.exp_manager_hooks:
            final_state = {
                "params": params,
                "ema_params": ema_params,
                "opt_state": opt_state,
                "step": step,
            }
            if phema_state is not None:
                final_state["phema"] = phema_state
            self.exp_manager_hooks.finalize(model, final_state)
        logging.info(f"Training finished at step {step}")

    # ----------------------------------------------------------- update fn ----
    def _build_update_fn(self, train_step_fn, tx):
        """One jitted optimizer step. With ``accumulate_grad_batches > 1`` the
        batch arrives stacked as [accum, micro_batch, ...] and a ``lax.scan``
        averages the micro-batch gradients in-graph — so ``step`` (and with it
        the LR schedule, EMA decay, ``max_steps``, ``save_every`` and
        checkpoint cadence) counts OPTIMIZER steps, matching the PTL
        accumulation semantics the reference config exposes
        (examples/configs/ddpm/unet_small.yaml trainer block)."""
        accum = self.accumulate_grad_batches
        ema_decay = self.ema_decay

        # ``step`` is a CARRIED device scalar and the per-step key is derived
        # in-graph (fold_in(base_key, step) — same stream as the historical
        # host-side derivation, bitwise). Rationale: a host-created
        # ``fold_in``/``asarray(step)`` pair per step is two extra dispatches
        # through the (remote) device queue; once the device step got fast
        # (s2d geometry: 2.1 ms) they dominated wall-clock — measured 7.2k ->
        # 15.5k samples/sec on the s2d trainer by hoisting them in-graph.
        def step_body(params, opt_state, ema_params, batch, base_key, step):
            key = jax.random.fold_in(base_key, step)
            if accum == 1:
                (loss, metrics), grads = jax.value_and_grad(train_step_fn, has_aux=True)(
                    params, batch, key, step
                )
            else:
                def micro(carry, xs):
                    g_acc, loss_acc = carry
                    mb, i = xs
                    (loss_i, metrics_i), g_i = jax.value_and_grad(
                        train_step_fn, has_aux=True
                    )(params, mb, jax.random.fold_in(key, i), step)
                    return (jax.tree.map(jnp.add, g_acc, g_i), loss_acc + loss_i), metrics_i

                zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
                (g_sum, _), metrics_st = jax.lax.scan(
                    micro,
                    (zeros, jnp.asarray(0.0, jnp.float32)),
                    (batch, jnp.arange(accum)),
                )
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                metrics = jax.tree.map(lambda m: m.mean(axis=0), metrics_st)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = ema_update(ema_params, params, ema_decay, step)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, ema_params, step + 1, metrics

        self._step_body = step_body  # un-jitted; reused by the multi-step scan
        return jax.jit(step_body, donate_argnums=(0, 1, 2, 5))

    def _build_multi_update_fn(self, train_step_fn, tx):
        """K full optimizer steps per device dispatch: ``lax.scan`` over the
        SAME single-step body with batches stacked [K, B, ...]. The key stream
        is fold_in(base_key, step) exactly as in single-step mode and the data
        order is unchanged, so a ``steps_per_execution=K`` run matches K
        single-step dispatches up to XLA fusion rounding — the scanned body
        and the top-level jit compile to slightly different fused kernels
        (~4e-9 grad-level; Adam amplifies to ~6e-6 param-level after 5 steps
        on CPU; tests/test_determinism.py). Each mode is individually
        bitwise-reproducible."""
        assert self.accumulate_grad_batches == 1, "steps_per_execution requires accum == 1"
        single = self._build_update_fn(train_step_fn, tx)  # jitted (tail steps)
        step_body = self._step_body

        @partial(jax.jit, donate_argnums=(0, 1, 2, 5))
        def update_multi(params, opt_state, ema_params, batches, base_key, step):
            def body(carry, mb):
                p, o, e, s = carry
                p, o, e, s, m = step_body(p, o, e, mb, base_key, s)
                return (p, o, e, s), m

            (params, opt_state, ema_params, step), ms = jax.lax.scan(
                body, (params, opt_state, ema_params, step), batches
            )
            # Report the group's LAST step (what per-step logging would show).
            metrics = jax.tree.map(lambda m: m[-1], ms)
            return params, opt_state, ema_params, step, metrics

        return update_multi, single

    @staticmethod
    def _accumulated(loader, accum: int):
        """Group ``accum`` consecutive micro-batches into one stacked batch
        ([accum, B, ...]); a trailing incomplete group is dropped, like
        drop_last."""
        if accum == 1:
            yield from loader
            return
        it = iter(loader)
        while True:
            group = list(itertools.islice(it, accum))
            if len(group) < accum:
                return
            yield {k: np.stack([g[k] for g in group]) for k in group[0]}

    def _apply_precision(self, model) -> None:
        """Honor the reference YAML ``trainer.precision`` (the PTL AMP field):
        16/bf16 variants map to bfloat16 network compute on TPU (params stay
        float32); anything else warns instead of being silently ignored."""
        p = str(self.precision).lower().replace("-true", "").replace("-mixed", "")
        if p in ("32", "32.0", "none", "float32", "fp32"):
            return
        if p in ("16", "16.0", "bf16", "bfloat16", "fp16"):
            net_cfg = model.cfg.get("diffusion_model")
            if net_cfg is None:
                logging.warning("trainer.precision set but model has no diffusion_model cfg")
                return
            if str(net_cfg.get("dtype", "float32")) in ("bfloat16", "bf16"):
                return
            net_cfg["dtype"] = "bfloat16"
            model.diffusion_model = model.build_network()
            model._jit_cache.clear()
            logging.info(
                f"trainer.precision={self.precision} → network compute dtype bfloat16 "
                "(TPU has no fp16 MXU path; params remain float32)"
            )
            return
        logging.warning(
            f"trainer.precision={self.precision!r} is not supported on TPU; using the "
            "model's configured compute dtype (set model.diffusion_model.dtype explicitly)"
        )

    # ------------------------------------------------------------------ test ----
    def test(self, model) -> Dict[str, float]:
        if model._test_dl is None and model.cfg.get("test_ds"):
            model.setup_test_data(model.cfg.test_ds)
        test_dl = model._test_dl
        if test_dl is None:
            raise ValueError("No test dataloader configured (model.cfg.test_ds)")
        from ..data.prefetch import ThreadedPrefetcher

        max_batches = self._resolve_limit_batches(self.limit_test_batches, len(test_dl))
        test_dl = ThreadedPrefetcher(test_dl, depth=2)

        outputs = []
        for i, batch in enumerate(test_dl):
            if i >= max_batches:
                break
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), i)
            outputs.append(model.test_step(batch, i, key=key))
        result = model.test_epoch_end(outputs)
        self._log_metrics(result, self.global_step)
        return result

    # ------------------------------------------------------------------ util ----
    @staticmethod
    def _resolve_limit_batches(limit, n_batches: int) -> int:
        """PTL semantics: int = batch count, float in [0, 1] = fraction."""
        if limit is None:
            return n_batches
        if isinstance(limit, int) and not isinstance(limit, bool):
            return min(limit, n_batches)
        f = float(limit)
        if 0.0 <= f <= 1.0:
            return max(int(n_batches * f), 1) if f > 0 else 0
        return min(int(f), n_batches)

    def _put_batch(self, batch: Dict[str, np.ndarray], stacked: bool = False):
        """Process-local host batch → globally-sharded device arrays.
        ``stacked`` marks grad-accumulation batches [accum, B, ...]: the
        micro-batch dim (1) is the one split over ``data``. Multi-host ready:
        each process contributes only its local rows
        (``jax.make_array_from_process_local_data``); the loader shards rows
        per process (DataLoader process_index/process_count)."""
        # Rows are split over the ``data`` axis only (a tensor-parallel
        # ``model`` axis replicates the batch), and each process feeds the
        # rows its addressable devices own.
        data_size = self.mesh.shape["data"]
        if data_size % jax.process_count() != 0:
            raise ValueError(
                f"data-axis extent ({data_size}) must be divisible by the "
                f"process count ({jax.process_count()}); adjust trainer.devices "
                "or tp_size."
            )
        n_local = data_size // jax.process_count()
        dim = 1 if stacked else 0
        for k, v in batch.items():
            if np.shape(v)[dim] % n_local != 0:
                raise ValueError(
                    f"{'Micro-batch' if stacked else 'Batch'} dim of `{k}` "
                    f"({np.shape(v)[dim]}) must be divisible by this process's "
                    f"data-axis share ({n_local}); adjust batch_size, "
                    "trainer.devices, or tp_size."
                )
        return put_global_batch(self.mesh, batch, batch_dim=dim)

    def _log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        if self.exp_manager_hooks:
            self.exp_manager_hooks.log_metrics(metrics, step)
        else:
            pretty = ", ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items()
            )
            logging.info(f"step {step}: {pretty}")
