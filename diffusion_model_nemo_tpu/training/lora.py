"""LoRA fine-tuning — Hu et al. 2021 (arXiv:2106.09685) for diffusion models.

Beyond the reference's surface (it only supports full fine-tuning via
``restore_from`` + Trainer): low-rank adapters ΔW = (α/r)·A·B on the U-Net's
conv/dense kernels, trained with the BASE WEIGHTS FROZEN. The optimizer
state shrinks from 2× the model to 2× the adapters (typically 1-5% of the
params), and a fine-tune ships as a tiny adapter file that applies to the
original archive.

TPU design notes:
  - The merged weight W + (α/r)·A·B is formed IN-GRAPH inside the jitted
    step: XLA constant-folds nothing here (A, B are traced), but the merge
    is one small matmul per kernel — negligible next to the U-Net — and the
    backward through the merge gives exactly the LoRA gradients
    (∂L/∂A = ∂L/∂W · Bᵀ) with no hand-written VJP.
  - Base params are a non-donated argument (resident in HBM, never copied);
    adapters + optimizer state are donated — steady-state allocations are
    adapter-sized only.
  - Conv kernels [kh, kw, cin, cout] factor as A:[kh·kw·cin, r] × B:[r, cout]
    — the full-rank reshape, so rank=min(fan_in, cout) can represent any
    update (pinned by tests/test_lora.py's merge-math anchor).

At inference there is ZERO overhead: ``merge_adapters`` bakes ΔW into a
normal parameter tree, so sampling/serving run the stock cached-jit paths.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import logging

__all__ = [
    "lora_init",
    "merge_adapters",
    "adapter_param_count",
    "save_adapters",
    "load_adapters",
    "LoRAFinetuner",
]

_SEP = "/"


def _walk_kernels(tree: Dict, prefix: str = "") -> List[Tuple[str, jnp.ndarray]]:
    """(path, leaf) for every matmul-shaped 'kernel' leaf, sorted by path."""
    out: List[Tuple[str, jnp.ndarray]] = []
    for name in sorted(tree):
        val = tree[name]
        path = f"{prefix}{_SEP}{name}" if prefix else str(name)
        if isinstance(val, dict):
            out.extend(_walk_kernels(val, path))
        elif name == "kernel" and getattr(val, "ndim", 0) >= 2:
            out.append((path, val))
    return out


def lora_init(
    params: Dict,
    rank: int,
    key: jax.Array,
    targets: str = ".*",
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Create zero-effect adapters {path: {a, b}} for every kernel whose
    path matches the ``targets`` regex (searched, '/'-joined module path).

    A ~ N(0, 1/√fan_in), B = 0 — the LoRA init: ΔW = 0 at step 0, so the
    fine-tune starts EXACTLY at the base model.
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    pat = re.compile(targets)
    kernels = [(p, v) for p, v in _walk_kernels(params) if pat.search(p)]
    if not kernels:
        raise ValueError(f"no kernels match targets={targets!r}")
    adapters: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, kern in kernels:
        fan_in = int(np.prod(kern.shape[:-1]))
        cout = int(kern.shape[-1])
        r = min(rank, fan_in, cout)
        key, sub = jax.random.split(key)
        adapters[path] = {
            "a": (jax.random.normal(sub, (fan_in, r), dtype) / np.sqrt(fan_in)),
            "b": jnp.zeros((r, cout), dtype),
        }
    return adapters


def _get(tree: Dict, path: str):
    node = tree
    for part in path.split(_SEP):
        node = node[part]
    return node


def _set(tree: Dict, path: str, value) -> Dict:
    """Functional set: shallow-copies only the nodes along ``path``."""
    parts = path.split(_SEP)
    new = dict(tree)
    node = new
    for part in parts[:-1]:
        node[part] = dict(node[part])
        node = node[part]
    node[parts[-1]] = value
    return new


def merge_adapters(params: Dict, adapters: Dict[str, Dict], scale: float) -> Dict:
    """W + scale·reshape(A@B) for every adapted kernel (jit-traceable)."""
    merged = params
    for path, ab in adapters.items():
        kern = _get(params, path)
        delta = (ab["a"] @ ab["b"]).reshape(kern.shape).astype(kern.dtype)
        merged = _set(merged, path, kern + scale * delta)
    return merged


def adapter_param_count(adapters: Dict[str, Dict]) -> int:
    return sum(int(v.size) for v in jax.tree.leaves(adapters))


def save_adapters(path: str, adapters: Dict[str, Dict], rank: int, alpha: float,
                  targets: str) -> str:
    """Adapters + metadata as one .npz (tiny — ships separately from the
    base archive; ``load_adapters`` + ``merge_adapters`` reapply them)."""
    flat = {}
    for p, ab in adapters.items():
        flat[f"{p}::a"] = np.asarray(ab["a"])
        flat[f"{p}::b"] = np.asarray(ab["b"])
    np.savez(
        path,
        __lora_meta__=np.array([rank, alpha], np.float64),
        __lora_targets__=np.array(targets),
        **flat,
    )
    return path


def load_adapters(path: str) -> Tuple[Dict[str, Dict], int, float, str]:
    with np.load(path, allow_pickle=False) as z:
        rank, alpha = z["__lora_meta__"]
        targets = str(z["__lora_targets__"])
        adapters: Dict[str, Dict] = {}
        for k in z.files:
            if k.startswith("__lora_"):
                continue
            p, which = k.rsplit("::", 1)
            adapters.setdefault(p, {})[which] = jnp.asarray(z[k])
    return adapters, int(rank), float(alpha), targets


class LoRAFinetuner:
    """Trains LoRA adapters on a frozen model through its own
    ``training_step`` — any family whose step is pure (params, batch, key,
    step) works unchanged (DDPM/conditional/EDM/flow/SR3/…).

    Args:
        model: a restored model; ``model.params`` are the frozen base.
        rank / alpha: adapter rank and LoRA scaling (ΔW is scaled α/r;
            alpha defaults to rank, i.e. scale 1).
        targets: regex over '/'-joined param paths selecting which kernels
            get adapters (default: all conv + dense kernels).
        optimizer: "adamw" or "sgd" (sgd exists for scale-sensitive
            equivalence tests, like the distillers).
        mesh: optional data mesh — base+adapters replicated, batches
            sharded via ``put_global_batch``, SPMD gradient reductions.
    """

    def __init__(
        self,
        model,
        rank: int = 8,
        alpha: Optional[float] = None,
        targets: str = ".*",
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        optimizer: str = "adamw",
        mesh=None,
        key: Optional[jax.Array] = None,
    ):
        self.model = model
        self.rank = int(rank)
        self.alpha = float(alpha if alpha is not None else rank)
        self.scale = self.alpha / self.rank
        self.targets = targets
        self.mesh = mesh
        self.adapters = lora_init(
            model.params, self.rank, key if key is not None else jax.random.PRNGKey(0),
            targets,
        )
        if optimizer == "adamw":
            opt = optax.adamw(float(learning_rate), weight_decay=float(weight_decay))
        elif optimizer == "sgd":
            opt = optax.sgd(float(learning_rate))
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        self._tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), opt)
        n_base = sum(int(p.size) for p in jax.tree.leaves(model.params))
        n_ad = adapter_param_count(self.adapters)
        logging.info(
            f"LoRA r={self.rank} α={self.alpha}: {len(self.adapters)} kernels, "
            f"{n_ad:,} trainable params ({100.0 * n_ad / n_base:.2f}% of base)"
        )
        self._step = self._build_step()

    def _build_step(self):
        model = self.model
        tx = self._tx
        scale = self.scale

        def loss_fn(adapters, base_params, batch, key, step_idx):
            merged = merge_adapters(base_params, adapters, scale)
            loss, metrics = model.training_step(merged, batch, key, step_idx)
            return loss, metrics

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(adapters, opt_state, base_params, batch, key, step_idx):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                adapters, base_params, batch, key, step_idx
            )
            updates, opt_state = tx.update(grads, opt_state, adapters)
            adapters = optax.apply_updates(adapters, updates)
            return adapters, opt_state, loss

        return step

    def finetune(
        self,
        batches: Iterator,
        steps: int,
        key: jax.Array,
        log_every: int = 50,
    ) -> List[float]:
        """Run ``steps`` adapter updates; returns the logged losses."""
        base_params = self.model.params
        adapters = self.adapters
        if self.mesh is not None:
            from ..parallel.sharding import param_shardings_for_strategy

            base_params = jax.device_put(
                base_params, param_shardings_for_strategy(base_params, self.mesh, "ddp")
            )
            adapters = jax.device_put(
                adapters, param_shardings_for_strategy(adapters, self.mesh, "ddp")
            )
        opt_state = self._tx.init(adapters)
        losses: List[float] = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            batch = next(batches)
            if self.mesh is not None:
                from ..parallel.mesh import put_global_batch

                batch = put_global_batch(self.mesh, batch)
            adapters, opt_state, loss = self._step(
                adapters, opt_state, base_params, batch, sub, jnp.int32(i)
            )
            if log_every and (i % log_every == 0 or i == steps - 1):
                losses.append(float(loss))
                logging.info(f"[lora] step {i}: loss {losses[-1]:.5f}")
        self.adapters = adapters
        return losses

    # ---- packaging -------------------------------------------------------------
    def merged_params(self) -> Dict:
        return jax.device_get(
            jax.jit(merge_adapters, static_argnums=2)(
                self.model.params, self.adapters, self.scale
            )
        )

    def merged_model(self):
        """A same-family model with ΔW baked in — samples/serves/archives
        through every stock path with zero inference overhead."""
        import copy

        from ..config.yaml_config import from_dict

        merged = type(self.model)(cfg=copy.deepcopy(from_dict(self.model.cfg)))
        params = jax.tree.map(jnp.asarray, self.merged_params())
        merged.params = params
        merged.ema_params = jax.tree.map(jnp.copy, params)
        return merged

    def save_adapters(self, path: str) -> str:
        return save_adapters(path, self.adapters, self.rank, self.alpha, self.targets)
