"""Tap-split 3×3 convolution Pallas kernel for lane-starved channel counts.

Why: XLA's conv emitters for the flagship's level-0 shapes (C=32 in/out,
32×32 spatial) cap at N=32 output lanes in the implicit GEMM — 25% of the
128-lane MXU — and profile at ~22% (convert_reduce_fusion.* in the optimized
HLO, ~55 µs for a 2.4 GFLOP conv on v5e). No exact reformulation can widen
the N=C_out=32 GEMM… unless the kernel's spatial taps are split between the
contraction and output dims:

    u[(i,j), (tx,co)] = Σ_{ty,ci} W[ty,tx,ci,co] · x[i+ty-1, j, ci]
    y[i,j,co]         = Σ_{tx}    u[(i, j+tx-1), (tx,co)]

The first line is ONE GEMM with K=(ty,ci)=3C and N=(tx,co)=3F — for C=F=32
that is 96×96, using 75% of both MXU dims instead of 25% of one — and the
second is three masked shifted adds (VPU). Every original MAC is performed
exactly once; only the f32 accumulation order differs from XLA's conv.

The u tensor is 3× the output and must never touch HBM — hence Pallas: u
lives in VMEM per grid step (a block of batch samples), x is read once and
y written once. Reverse mode falls back to the XLA convolution (custom_vjp
— do not jvp through this op).

Reference counterpart: every `Block.proj` 3×3 conv
(diffusion_model_nemo/modules/parts.py:48-58); numerics are the same conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _shift_rows(arr, shift):
    """arr shifted down by `shift` rows (vacated rows undefined — callers
    mask them). pltpu.roll wraps, which Mosaic supports for any offset
    (unaligned sublane concatenation does not lower); its rotate only
    handles 32-bit lanes, so bf16 operands round-trip through f32."""
    from jax.experimental.pallas import tpu as pltpu

    if arr.dtype == jnp.bfloat16:
        return pltpu.roll(
            arr.astype(jnp.float32), shift=shift % arr.shape[0], axis=0
        ).astype(jnp.bfloat16)
    return pltpu.roll(arr, shift=shift % arr.shape[0], axis=0)

__all__ = ["conv3x3_tap_split", "conv3x3_reference", "pack_tap_split_weights"]


def conv3x3_reference(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None) -> jnp.ndarray:
    """XLA path: NHWC SAME 3×3 conv, f32 accumulation (flax nn.Conv semantics)."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def pack_tap_split_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,F] → [(ty·C+ci), (tx·F+co)] for the tap-split GEMM."""
    kh, kw, C, F = w.shape
    assert kh == 3 and kw == 3, w.shape
    # [ty, tx, ci, co] -> [ty, ci, tx, co] -> [3C, 3F]
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * C, 3 * F)


def _tap_split_kernel(x_ref, wp_ref, b_ref, o_ref, *, C: int, F: int):
    """One block of samples: [G,H,W,C] → [G,H,W,F], u in VMEM."""
    G, H, Wd, _ = x_ref.shape
    M = G * H * Wd
    x = x_ref[...].reshape(M, C)

    # i-shifted copies (rows move by one image row = W lanes of m), zeroed at
    # the i=0 / i=H-1 sample boundaries so taps never read across samples.
    m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    hw = H * Wd
    x_up = _shift_rows(x, -Wd)                           # x[i+1, j] (wraps)
    x_dn = _shift_rows(x, Wd)                            # x[i-1, j] (wraps)
    x_dn = jnp.where((m % hw) >= Wd, x_dn, 0).astype(x.dtype)
    x_up = jnp.where((m % hw) < (hw - Wd), x_up, 0).astype(x.dtype)

    patches = jnp.concatenate([x_dn, x, x_up], axis=1)   # [M, 3C] (ty-major)

    u = jax.lax.dot_general(
        patches,
        wp_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 3F], f32

    # j-shifted accumulation of the three tx slabs; j boundaries masked.
    left = _shift_rows(u[:, :F], 1)          # u[(i, j-1), tx=0] (wraps)
    right = _shift_rows(u[:, 2 * F :], -1)   # u[(i, j+1), tx=2] (wraps)
    j = m % Wd
    left = jnp.where(j > 0, left, 0)
    right = jnp.where(j < Wd - 1, right, 0)
    y = left + u[:, F : 2 * F] + right + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype).reshape(G, H, Wd, F)


def _pallas_conv3x3(x, wp, b, F, block_g, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    kernel = functools.partial(_tap_split_kernel, C=C, F=F)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), x.dtype),
        grid=(B // block_g,),
        in_specs=[
            pl.BlockSpec((block_g, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, 3 * F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_g, H, W, F), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, wp, b)


def _use_tap_split(x, w) -> bool:
    """MEASURED AND REJECTED as a default (v5e, 2026-08-17): at the flagship
    level-0 shape [128,32,32,32->32] the tap-split kernel ran ~1.3x SLOWER
    than XLA's conv (same-process interleaved timing; XLA's
    EmitInputBatchInLanes emitter reaches ~60% MFU isolated, far above the
    25% naive N=32 lane ceiling this kernel was designed to beat). Kept as
    an opt-in (DMN_TPU_TAP_SPLIT_CONV=1) measurement artifact."""
    import os

    flag = os.environ.get("DMN_TPU_TAP_SPLIT_CONV")
    if jax.default_backend() not in ("tpu", "axon"):
        return flag == "interpret"
    if flag != "1":
        return False
    B, H, W, C = x.shape
    F = w.shape[-1]
    if not (w.shape[0] == 3 and w.shape[1] == 3):
        return False
    if F >= 128 or C >= 128:
        return False
    if (H * W) % 8 or B % 8:
        return False
    return True


def _block_g(x, F) -> int:
    B, H, W, C = x.shape
    per_sample = H * W * (C * 2 + 3 * C * 2 + 3 * F * 4 + F * 2)  # bf16 x/patches/y, f32 u
    budget = 10 * 1024 * 1024
    g = max(min(B, budget // max(per_sample, 1)), 1)
    while B % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_tap_split(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SAME 3×3 conv; tap-split Pallas kernel on TPU for lane-starved widths,
    XLA conv elsewhere. Same MACs as the conv — f32 accumulation order is the
    only difference. Reverse mode uses the XLA conv (custom_vjp)."""
    if _use_tap_split(x, w):
        interpret = jax.default_backend() not in ("tpu", "axon")
        wp = pack_tap_split_weights(w).astype(x.dtype)
        return _pallas_conv3x3(
            x, wp, b.reshape(1, -1).astype(x.dtype), w.shape[-1],
            _block_g(x, w.shape[-1]), interpret,
        )
    return conv3x3_reference(x, w, b)


def _fwd(x, w, b):
    return conv3x3_tap_split(x, w, b), (x, w)


def _bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww, bb: conv3x3_reference(xx, ww, bb), x, w, jnp.zeros((w.shape[-1],), x.dtype))
    return vjp(g)


conv3x3_tap_split.defvjp(_fwd, _bwd)
