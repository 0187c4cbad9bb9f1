"""Pipeline parallelism: GPipe microbatch scheduling via shard_map+ppermute.

Beyond the reference's surface (its only strategy is PTL DDP,
examples/configs/ddpm/unet_small.yaml:88). TPU-native pipelining is NOT a
process-per-stage runtime like GPipe-on-NCCL: all stages live in ONE SPMD
program over a ``pipe`` mesh axis, each device holds its stage's slice of a
stacked ``[P, ...]`` parameter tree, and activations move stage-to-stage
with ``jax.lax.ppermute`` over ICI. The classic schedule falls out of a
static loop of ``M + P - 1`` steps: at step ``s``, stage ``i`` works on
microbatch ``s - i`` (devices run their stage body every step — the pipeline
bubble is computed-but-discarded work, exactly as in production TPU
pipelining; see the scaling-book's pipelining chapter for the model).

Everything is differentiable (the transpose of a ``ppermute`` is the
reverse ``ppermute``), so ``jax.grad`` through :func:`pipeline_apply` yields
pipeline-parallel backprop with the same schedule reversed — no separate
backward plumbing.

Composes with data parallelism on an outer ``data`` axis: microbatches keep
their batch dimension sharded over ``data`` while activations rotate over
``pipe`` (a 2-D ``(data, pipe)`` mesh runs DP×PP with zero extra code).

Designed for homogeneous stage stacks — the DiT backbone's transformer
blocks (modules/dit.py) are the natural citizen; the U-Net's pyramid is
heterogeneous and stays on the DP/FSDP/TP strategies.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

__all__ = ["stack_pipeline_params", "pipeline_spec", "pipeline_apply"]


def stack_pipeline_params(stage_params: Sequence[Any]) -> Any:
    """Stack per-stage parameter trees (identical treedefs) into one tree of
    ``[P, ...]`` leaves — the layout :func:`pipeline_apply` shards over the
    ``pipe`` mesh axis."""
    if not stage_params:
        raise ValueError("need at least one stage")
    return jax.tree.map(lambda *leaves: jnp.stack(leaves, axis=0), *stage_params)


def pipeline_spec(stacked_params: Any, mesh: Mesh, axis: str = "pipe") -> Any:
    """NamedSharding pytree placing each stage's slice on its pipe device
    (leading dim over ``axis``, everything else unsharded)."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(axis, *([None] * (jnp.ndim(leaf) - 1)))),
        stacked_params,
    )


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
) -> Any:
    """Run ``x`` through ``P`` chained stages with GPipe microbatching.

    ``stage_fn(params_i, h) -> h`` is one stage's forward on a microbatch;
    ``stacked_params`` holds all stages stacked on a leading ``[P, ...]``
    axis (see :func:`stack_pipeline_params`). ``x`` is the global batch —
    an array ``[B, ...]`` or a pytree of arrays sharing dim-0 size ``B``
    (e.g. the DiT's ``(tokens, conditioning)`` pair, with the conditioning
    passed through each stage unchanged) — split into ``num_microbatches``
    (default ``P``) equal microbatches along dim 0. Returns
    ``stage_{P-1}(... stage_0(x))`` with ``x``'s structure/shapes (stages
    must be shape-preserving, the transformer case).

    With ``data_axis`` the microbatch batch dimension additionally stays
    sharded over that mesh axis (DP×PP). The result is returned replicated
    over ``axis`` (a ``psum`` fans the last stage's buffer out — fine at
    these model sizes; keep outputs stage-local if chaining pipelines).
    """
    n_stages = mesh.shape[axis]
    M = int(num_microbatches or n_stages)
    leaves = jax.tree.leaves(x)
    B = leaves[0].shape[0]
    if any(l.shape[0] != B for l in leaves):
        raise ValueError("all activation leaves must share the batch dim")
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    first = jax.tree.leaves(stacked_params)[0]
    if first.shape[0] != n_stages:
        raise ValueError(
            f"stacked params lead dim {first.shape[0]} != mesh[{axis!r}] {n_stages}"
        )

    xm = jax.tree.map(lambda l: l.reshape(M, B // M, *l.shape[1:]), x)

    batch_spec = jax.tree.map(
        lambda l: P(None, data_axis, *([None] * (jnp.ndim(l) - 2))), xm
    )
    param_spec = jax.tree.map(
        lambda leaf: P(axis, *([None] * (jnp.ndim(leaf) - 1))), stacked_params
    )

    def _select(pred, a, b):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    def per_device(params, xm):
        # params: this stage's [1, ...] slice; xm: the microbatch stream
        # (replicated over `axis`, batch-sharded over `data_axis`).
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        is_last = stage == (n_stages - 1)

        carry = jax.tree.map(lambda l: jnp.zeros_like(l[0]), xm)  # from the left
        outs = jax.tree.map(jnp.zeros_like, xm)
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for s in range(M + n_stages - 1):  # static schedule: traced once
            feed = jax.tree.map(lambda l: l[min(s, M - 1)], xm)  # stage-0 stream
            h = _select(stage == 0, feed, carry)
            y = stage_fn(params, h)  # every stage computes every step (bubble)
            mb = s - stage  # which microbatch stage holds this step
            valid = jnp.logical_and(mb >= 0, mb < M)
            write = jnp.logical_and(is_last, valid)
            # dynamic_update_slice at a clipped index; masked to a no-op
            # (writes the existing value back) when not the last stage.
            idx = jnp.clip(mb, 0, M - 1)

            def stash(buf, leaf):
                cur = jax.lax.dynamic_index_in_dim(buf, idx, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(write, leaf, cur), idx, 0
                )

            outs = jax.tree.map(stash, outs, y)
            carry = jax.tree.map(lambda l: jax.lax.ppermute(l, axis, fwd_perm), y)

        # Fan the last stage's buffer out so the caller sees a replicated
        # result (zeros elsewhere + psum == broadcast from last stage).
        outs = jax.tree.map(lambda l: jnp.where(is_last, l, jnp.zeros_like(l)), outs)
        return jax.tree.map(lambda l: jax.lax.psum(l, axis), outs)

    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(param_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )(stacked_params, xm)
    return jax.tree.map(lambda l: l.reshape(B, *l.shape[2:]), out)
