"""Optimizer + LR-schedule builder from ``cfg.optim``.

Replaces NeMo ModelPT's optimizer setup (the reference delegates AdamW +
CosineAnnealing construction to NeMo from the ``model.optim`` YAML block,
examples/configs/ddpm/unet_small.yaml:66-80) with an optax chain:
global-norm clip → AdamW(schedule). Schedule names: ``CosineAnnealing``
(with warmup_steps / warmup_ratio / min_lr), ``WarmupAnnealing``, ``None``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import optax

__all__ = ["build_optimizer", "build_lr_schedule"]


def build_lr_schedule(optim_cfg: Mapping[str, Any], max_steps: int) -> optax.Schedule:
    lr = float(optim_cfg.get("lr", 1e-3))
    sched_cfg = optim_cfg.get("sched") or {}
    name = (sched_cfg.get("name") or "none").lower()

    if name in ("none", "null"):
        return optax.constant_schedule(lr)

    warmup_steps = sched_cfg.get("warmup_steps")
    warmup_ratio = sched_cfg.get("warmup_ratio")
    if warmup_steps is None and warmup_ratio is not None:
        warmup_steps = int(float(warmup_ratio) * max_steps)
    warmup_steps = int(warmup_steps or 0)

    min_lr = float(sched_cfg.get("min_lr", 0.0) or 0.0)

    if name in ("cosineannealing", "warmupannealing", "cosine"):
        decay_steps = max(max_steps - warmup_steps, 1)
        cosine = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=decay_steps, alpha=min_lr / lr if lr > 0 else 0.0
        )
        if warmup_steps > 0:
            warmup = optax.linear_schedule(0.0, lr, warmup_steps)
            return optax.join_schedules([warmup, cosine], [warmup_steps])
        return cosine

    raise ValueError(f"Unknown LR schedule `{sched_cfg.get('name')}`")


def build_optimizer(
    optim_cfg: Optional[Mapping[str, Any]],
    max_steps: int,
    grad_clip: Optional[float] = 1.0,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the optax transformation + the LR schedule (for logging)."""
    optim_cfg = optim_cfg or {"name": "adamw", "lr": 1e-3}
    name = str(optim_cfg.get("name", "adamw")).lower()
    schedule = build_lr_schedule(optim_cfg, max_steps)

    betas = optim_cfg.get("betas", (0.9, 0.999))
    weight_decay = float(optim_cfg.get("weight_decay", 0.0))
    eps = float(optim_cfg.get("eps", 1e-8))

    if name == "adamw":
        opt = optax.adamw(
            schedule, b1=float(betas[0]), b2=float(betas[1]), eps=eps, weight_decay=weight_decay
        )
    elif name == "adam":
        opt = optax.adam(schedule, b1=float(betas[0]), b2=float(betas[1]), eps=eps)
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=float(optim_cfg.get("momentum", 0.0)))
    else:
        raise ValueError(f"Unknown optimizer `{name}`")

    chain = [opt]
    if grad_clip is not None and grad_clip > 0:
        chain = [optax.clip_by_global_norm(float(grad_clip)), *chain]
    return optax.chain(*chain), schedule
