"""Fused multi-head self-attention — Pallas TPU kernel with XLA fallback.

Used by the U-Net mid-block (reference parts/mha.py:7-30: 4 heads × 32,
max-subtracted softmax). The kernel fuses qk^T → stable softmax → ·v in one
VMEM pass per (batch·head), with float32 accumulation on the MXU; the
unfused path materializes the [N, N] score tensor in HBM twice.

Dispatch: Pallas on TPU for token counts where a head's working set fits
VMEM (N ≤ ~4096 at d=32); XLA fallback elsewhere (and for autodiff's
backward, via custom_vjp recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_attention", "attention_reference"]

_MAX_PALLAS_TOKENS = 4096


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, h, d] qkv (q pre-scaled) → [B, N, h, d]; XLA path.

    Matches the reference einsum formulation incl. the stop-gradient max
    subtraction (parts/mha.py:24-28).
    """
    sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn.astype(q.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch·head) per grid step; blocks are [1, N, d] in VMEM."""
    q = q_ref[0].astype(jnp.float32)  # [N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N]
    sim = sim - sim.max(axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / p.sum(axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [N, d]
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_attention(q, k, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, h, d = q.shape

    def merge(x):  # [B, N, h, d] → [B*h, N, d]
        return x.transpose(0, 2, 1, 3).reshape(B * h, N, d)

    spec = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B * h, N, d), q.dtype),
        grid=(B * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(merge(q), merge(k), merge(v))
    return out.reshape(B, h, N, d).transpose(0, 2, 1, 3)


def _use_pallas(q) -> bool:
    """Pallas attention is OPT-IN (DMN_TPU_PALLAS_ATTN=1) below 1k tokens.

    At the CIFAR bottleneck (N=16 tokens) the custom call costs ~0.19 ms/step
    incl. surrounding layout copies vs XLA's fused einsum path; the kernel
    pays off for longer sequences where the [N, N] score tensor would
    otherwise round-trip HBM (auto-enabled from 1024 tokens)."""
    import os

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, N, _, d = q.shape
    if N > _MAX_PALLAS_TOKENS:
        return False
    return N >= 1024 or os.environ.get("DMN_TPU_PALLAS_ATTN") == "1"


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, h, d] (q pre-scaled) → [B, N, h, d] attention output."""
    if _use_pallas(q):
        return _pallas_attention(q, k, v)
    return attention_reference(q, k, v)


def _fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
