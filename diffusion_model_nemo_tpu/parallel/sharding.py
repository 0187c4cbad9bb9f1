"""Parameter-sharding strategies: replicated DP, FSDP, and tensor parallel.

The reference's only distribution strategy is PyTorch-Lightning DDP selected
by YAML (``trainer.strategy: ddp``, examples/configs/ddpm/unet_small.yaml:88).
The TPU-native scale-out story is richer, and all of it rides XLA's SPMD
partitioner rather than hand-written collectives:

- **ddp** (default): batch sharded over the ``data`` mesh axis, parameters
  replicated. XLA emits the gradient all-reduce (``psum``) over ICI.
- **fsdp**: parameters, gradients, EMA, and optimizer state additionally
  sharded over ``data`` (ZeRO-3 layout). XLA inserts the all-gather before
  each layer's use and reduce-scatters the gradients. Memory per chip drops
  by ~the mesh size; communication stays on ICI.
- **tensor_parallel**: a 2-D ``(data, model)`` mesh. Parameters are sharded
  over ``model`` on their output-feature dimension (conv HWIO → O, dense
  (in, out) → out), activations over ``data``; XLA propagates the layout
  through the network and inserts the per-layer collectives. Composable with
  DP on the other axis (and with FSDP via ``fsdp_tp``).

Sharding inference is shape-driven, not name-driven: for each parameter leaf
pick the preferred dimension that divides the mesh-axis size (output features
first, then input features, then any); leaves too small to split stay
replicated. This works for every network in the zoo (U-Net, WaveGradUNet,
vocoder) without per-module annotations, which is the right altitude for
nets this size — XLA's propagation does the per-op layout work.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

__all__ = [
    "STRATEGIES",
    "make_strategy_mesh",
    "infer_param_shardings",
    "expert_param_shardings",
    "param_shardings_for_strategy",
]

STRATEGIES = ("ddp", "fsdp", "tensor_parallel", "fsdp_tp", "expert_parallel")


def make_strategy_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    strategy: Optional[str] = None,
    tp_size: int = 0,
) -> Mesh:
    """Mesh for a strategy: 1-D ``(data,)`` unless tensor parallel is on,
    then 2-D ``(data, model)`` with ``model`` of size ``tp_size``.

    ``tp_size`` <= 0 means auto: the largest of 4/2/1 dividing the device
    count (never raises). An explicit ``tp_size`` is honored verbatim —
    including the degenerate 1 — and raises if it does not divide."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    strategy = (strategy or "ddp").lower()
    if strategy in ("tensor_parallel", "tp", "fsdp_tp"):
        tp = int(tp_size)
        if tp <= 0:
            tp = next(t for t in (4, 2, 1) if n % t == 0)
        if n % tp != 0:
            raise ValueError(f"tp_size {tp} must divide device count {n}")
        return make_mesh(devices, axis_names=("data", "model"), shape=(n // tp, tp))
    if strategy in ("expert_parallel", "ep"):
        ep = int(tp_size)
        if ep <= 0:
            ep = next(t for t in (4, 2, 1) if n % t == 0)
        if n % ep != 0:
            raise ValueError(f"ep_size {ep} must divide device count {n}")
        return make_mesh(devices, axis_names=("data", "expert"), shape=(n // ep, ep))
    return make_mesh(devices)


def _shard_spec(shape: tuple, axis_size: int, prefer: Sequence[int]) -> Optional[int]:
    """Index of the dimension to shard, or None to replicate.

    ``prefer`` lists candidate dims in priority order (negative ok). A dim
    qualifies if it divides evenly by ``axis_size`` and each shard keeps at
    least a lane's worth of elements (tiny tables stay replicated — splitting
    them only buys communication)."""
    ndim = len(shape)
    for d in prefer:
        d = d % ndim if ndim else 0
        if d < ndim and shape[d] % axis_size == 0 and shape[d] // axis_size >= 8:
            return d
    return None


def infer_param_shardings(
    params: Any,
    mesh: Mesh,
    axis: str,
    extra_axis: Optional[str] = None,
) -> Any:
    """NamedSharding pytree for ``params``: each leaf sharded on its best
    dimension over ``axis`` (output features first). With ``extra_axis``
    (fsdp_tp), a second dimension is sharded over that axis too when one
    qualifies."""
    axis_size = mesh.shape[axis]
    extra_size = mesh.shape[extra_axis] if extra_axis else 0

    def leaf_sharding(leaf):
        # works on arrays and on jax.eval_shape's ShapeDtypeStructs alike,
        # so optimizer-state layouts can be inferred without materializing
        shape = getattr(leaf, "shape", None)
        if shape is None:
            shape = np.shape(leaf)
        shape = tuple(shape)
        spec = [None] * len(shape)
        # Output features last in both flax Conv (H, W, I, O) and Dense
        # (in, out) kernels; biases/scales are 1-D over output channels.
        d = _shard_spec(shape, axis_size, prefer=(-1, -2, 0))
        if d is not None:
            spec[d] = axis
        if extra_axis:
            remaining = [i for i in range(len(shape)) if i != d]
            for cand in sorted(remaining, key=lambda i: -shape[i]):
                if shape[cand] % extra_size == 0 and shape[cand] // extra_size >= 8:
                    spec[cand] = extra_axis
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf_sharding, params)


def expert_param_shardings(params: Any, mesh: Mesh, axis: str = "expert") -> Any:
    """NamedSharding pytree for expert parallelism: leaves whose tree path
    names an expert-stacked weight (``experts_*`` — the ``[E, ...]`` leading
    axis of :class:`~..modules.dit.ExpertChoiceMoE`) are sharded on dim 0
    over ``axis``; everything else (the dense trunk, routers, norms) stays
    replicated. Name-driven rather than shape-driven because nothing about a
    leading dim distinguishes "experts" from, say, a stacked conv kernel —
    the stacking convention is the contract."""
    axis_size = mesh.shape[axis]

    def leaf_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", np.shape(leaf)))
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any(str(n).startswith("experts_") for n in names):
            if shape and shape[0] % axis_size == 0:
                return NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def param_shardings_for_strategy(params: Any, mesh: Mesh, strategy: Optional[str]) -> Any:
    """Sharding pytree for model parameters under a named strategy."""
    strategy = (strategy or "ddp").lower()
    if strategy in ("ddp", "auto", "none", "null", "dp"):
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    if strategy == "fsdp":
        return infer_param_shardings(params, mesh, axis="data")
    if strategy in ("tensor_parallel", "tp"):
        return infer_param_shardings(params, mesh, axis="model")
    if strategy == "fsdp_tp":
        return infer_param_shardings(params, mesh, axis="model", extra_axis="data")
    if strategy in ("expert_parallel", "ep"):
        return expert_param_shardings(params, mesh, axis="expert")
    raise ValueError(f"Unknown strategy {strategy!r}; choose from {STRATEGIES}")
