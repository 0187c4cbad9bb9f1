"""Ring attention: exact softmax attention with the token axis sharded.

Beyond the reference's surface (SURVEY.md §2.7: the reference has no
sequence/context parallelism — its only attention is over flattened pixels
inside one GPU). This is the TPU-native mechanism for scaling the
transformer backbone (modules/dit.py) past one chip's HBM along the
*sequence* dimension: every device holds ``N / P`` query tokens and the
matching K/V shard, and the K/V blocks rotate around the mesh axis with
``ppermute`` while each device folds one block per step into an
**online-softmax** accumulator (the flash-attention recurrence of Liu et
al. 2023, "Ring Attention with Blockwise Transformers"). The result is
bitwise-shaped like full attention, exact up to float associativity, with
peak activation memory O(N·N/P) per device instead of O(N²).

Design notes:

- ``ring_attention_local`` is the collective core — call it INSIDE
  ``shard_map`` (or any manual-collective region) where q/k/v are the local
  token shards and ``axis_name`` is a mesh axis. It is a plain composition
  of einsums, ``ppermute`` and a ``lax.scan``, so it is reverse-mode
  differentiable out of the box (ppermute's transpose is the inverse
  rotation — the backward pass is itself a ring).
- Accumulation is float32 regardless of input dtype (matching
  ops/attention.attention_reference's preferred_element_type); the output
  is cast back to q.dtype.
- ``sequence_sharded_attention`` is the standalone entry: given global
  [B, N, H, D] arrays and a mesh, it shard_maps the core over the named
  axis. With ``mesh=None`` (or a 1-sized axis) it falls back to the fused
  single-device kernel — same signature as ops/attention.fused_attention
  (q pre-scaled).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "ring_attention_local",
    "sequence_sharded_attention",
    "sequence_parallel_dit_apply",
]


def ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """Exact attention over a token-sharded ring; call inside shard_map.

    q, k, v: ``[B, N_local, H, D]`` local shards (q pre-scaled by d^-1/2,
    the ops/attention convention). Returns ``[B, N_local, H, D]`` in
    q.dtype. ``axis_name`` must be a shard_map/pjit axis; the K/V blocks
    make one full rotation (``axis_size`` ppermute steps), so every query
    shard attends to every key exactly once.
    """
    axis_size = jax.lax.psum(1, axis_name)
    B, Nq, H, D = q.shape
    qf = q.astype(jnp.float32)

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def step(carry, _):
        o, l, m, kb, vb = carry
        # scores for this K/V block: [B, H, Nq, Nk_local]
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)  # [B, H, Nq]
        l = l * corr + p.sum(axis=-1)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        o = o * corr.transpose(0, 2, 1)[..., None] + pv
        # rotate the K/V blocks one step around the ring
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (o, l, m_new, kb, vb), None

    # Derive the zero/-inf accumulators from q so they inherit q's varying
    # manual axes (the ring axis, plus any batch axes the caller also
    # sharded) — shard_map's vma tracking requires the scan carry types to
    # match the axis-varying outputs exactly.
    zero_o = qf * 0.0  # [B, Nq, H, D]
    zero_row = zero_o[..., 0].transpose(0, 2, 1)  # [B, H, Nq]
    init = (zero_o, zero_row, zero_row - jnp.inf, k, v)
    (o, l, _, _, _), _ = jax.lax.scan(step, init, None, length=axis_size)
    return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def sequence_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Optional[Mesh] = None,
    axis_name: str = "seq",
    batch_axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """fused_attention with the token axis sharded over ``mesh[axis_name]``.

    Global view: q/k/v are ``[B, N, H, D]``; the call shard_maps
    :func:`ring_attention_local` so each device owns ``N / P`` tokens
    (optionally also sharding batch over ``batch_axis_name`` — batch needs
    no collectives). Falls back to the single-device fused kernel when no
    mesh is given or the axis has size 1.
    """
    if mesh is None or int(mesh.shape.get(axis_name, 1)) == 1:
        from ..ops.attention import fused_attention

        return fused_attention(q, k, v)
    if q.shape[1] % int(mesh.shape[axis_name]):
        raise ValueError(
            f"token count {q.shape[1]} not divisible by mesh axis "
            f"{axis_name!r} of size {mesh.shape[axis_name]}"
        )
    spec = P(batch_axis_name, axis_name, None, None)
    fn = jax.shard_map(
        partial(ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def sequence_parallel_dit_apply(
    module,
    params,
    x: jnp.ndarray,
    time: jnp.ndarray,
    classes: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis_name: str = "seq",
):
    """Run a DiT whose tokens are sharded over ``mesh[axis_name]``.

    ``module`` must be constructed with ``seq_axis_name=axis_name`` (the
    parameter tree is identical to the unsharded module's — the flag only
    switches the attention core to :func:`ring_attention_local` and offsets
    the positional table by the device's row-block start). ``x`` is the
    GLOBAL ``[B, H, W, C]`` batch; image rows (dim 1) are split over the
    axis, which — row-major patchify — is exactly a contiguous split of the
    token sequence. Everything else in the DiT is token-local, so only the
    attention core communicates (ppermute over ICI). Fully differentiable:
    jit/grad through this call for sequence-parallel training.

    Note: with ``moe_experts > 0`` the expert-choice top-C routing becomes
    shard-local (each device's experts rank only its own tokens) — standard
    practice for sequence-sharded MoE, but not numerically identical to the
    unsharded module.
    """
    n = int(mesh.shape[axis_name])
    p = int(module.patch_size)
    if getattr(module, "seq_axis_name", None) != axis_name:
        raise ValueError(
            f"module.seq_axis_name={getattr(module, 'seq_axis_name', None)!r} "
            f"must equal axis_name={axis_name!r} (construct the DiT with "
            "seq_axis_name set)"
        )
    if x.shape[1] % (n * p):
        raise ValueError(
            f"image height {x.shape[1]} must divide into {n} shards of whole "
            f"patch rows (patch_size {p})"
        )
    spec_x = P(None, axis_name, None, None)

    if classes is None:

        def fwd(p_, x_, t_):
            return module.apply({"params": p_}, x_, t_, deterministic=True)

        fn = jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), spec_x, P()), out_specs=spec_x
        )
        return fn(params, x, time)

    def fwd(p_, x_, t_, c_):
        return module.apply({"params": p_}, x_, t_, classes=c_, deterministic=True)

    fn = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), spec_x, P(), P()), out_specs=spec_x
    )
    return fn(params, x, time, classes)
