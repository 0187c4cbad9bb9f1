"""Probe: does feeding the linattn kernel an unpadded-lane operand win?

The v3 kernel's operand is [B, N, C] with C=32/64 minor -> the (8,128) tile
pads lanes 4x/2x: the XLA-side repack copy writes 4x the bytes and the
kernel reads them back. Candidate v4 passes the SAME buffer bitcast to
[B, N*C/128, 128] (no lane padding) and reshapes back to [chunk*N, C] rows
inside the kernel -- the open question is what Mosaic's in-VMEM relayout
for that reshape costs.  Also probes a 2-D transpose [N*C, B] -> [B, N*C]
(the batch-minor grand plan's primitive).

Usage: python tools/microbench_attn_lanes.py
"""
import functools
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np

REPS = 50


def timed(fn, x, rounds=5):
    c = jax.jit(lambda x: jax.lax.fori_loop(0, REPS, lambda i, y: fn(y), x))
    c(x).block_until_ready()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter(); c(x).block_until_ready()
        ts.append((time.perf_counter() - t0) / REPS * 1e6)
    return float(np.median(ts))


def _v4_kernel(x_ref, wqkv_ref, o_ref, *, n_tokens, heads, dim_head, scale):
    """Same math as _linattn_qkv_fused_kernel but the operand block is
    [G, N*C/128, 128]; rows regroup to [G*N, C] in VMEM."""
    from diffusion_model_nemo_tpu.ops import attention as A

    G, R, L = x_ref.shape
    C = (R * L) // n_tokens
    hd = heads * dim_head
    M = G * n_tokens
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)

    h = x_ref[...].reshape(M, C)  # in-VMEM relayout: lanes -> sublanes
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...].astype(h.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = qkv[:, :hd]
    qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
    q_den = jax.lax.dot_general(qe, mask, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q_sm = (qe / q_den * scale).astype(o_ref.dtype)
    N = n_tokens
    for g in range(G):
        k = qkv[g * N:(g + 1) * N, hd:2 * hd]
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = (ke / jnp.sum(ke, axis=0, keepdims=True)).astype(o_ref.dtype)
        v = qkv[g * N:(g + 1) * N, 2 * hd:].astype(o_ref.dtype)
        gram = jax.lax.dot_general(k_sm, v, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        gram = (gram * mask).astype(o_ref.dtype)
        o_ref[g] = jax.lax.dot_general(
            q_sm[g * N:(g + 1) * N], gram, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def v4_call(x, wqkv, heads, dim_head, scale, block_g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    hd = heads * dim_head
    R = (N * C) // 128
    x2 = x.reshape(B, R, 128)
    kernel = functools.partial(_v4_kernel, n_tokens=N, heads=heads,
                               dim_head=dim_head, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, hd), x.dtype),
        grid=(B // block_g,),
        in_specs=[
            pl.BlockSpec((block_g, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_g, N, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(x2, wqkv)
    return out


def _tr_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def transpose_probe(rows, lanes, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.zeros((rows, lanes), dtype)
    f = lambda x: pl.pallas_call(
        _tr_kernel,
        out_shape=jax.ShapeDtypeStruct((lanes, rows), dtype),
        in_specs=[pl.BlockSpec((rows, lanes), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((lanes, rows), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(x)
    # compose via transpose-back so the loop type-checks
    g = lambda y: f(f(y).T.reshape(rows, lanes)) if False else f(y)
    c = jax.jit(lambda x: jax.lax.fori_loop(
        0, REPS, lambda i, y: f(y.T), x))
    c(x).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); c(x).block_until_ready()
        ts.append((time.perf_counter() - t0) / REPS * 1e6)
    return float(np.median(ts))


def main():
    from diffusion_model_nemo_tpu.ops.attention import (
        _pallas_linattn_qkv_fused, linear_attention_qkv_reference)

    heads, dim_head = 4, 32
    hd = heads * dim_head
    scale = dim_head ** -0.5
    for (B, N, C) in [(128, 1024, 32), (128, 256, 64)]:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (B, N, C), jnp.float32).astype(jnp.bfloat16)
        wqkv = jax.random.normal(jax.random.fold_in(k, 1), (C, 3 * hd)) * 0.1
        wout = jax.random.normal(jax.random.fold_in(k, 2), (hd, C)) * 0.1

        def v3(x, g=None):
            a = _pallas_linattn_qkv_fused(x, wqkv, heads, dim_head, scale, block_g=g)
            return jnp.dot(a.astype(x.dtype), wout.astype(x.dtype))

        def v4(x, g):
            a = v4_call(x, wqkv, heads, dim_head, scale, g)
            return jnp.dot(a.astype(x.dtype), wout.astype(x.dtype))

        ref = np.asarray(jax.jit(lambda y: jnp.dot(
            linear_attention_qkv_reference(
                jnp.dot(y, wqkv.astype(y.dtype)), heads, dim_head, scale
            ).astype(y.dtype), wout.astype(y.dtype)))(x), np.float32)
        for g in (2, 4, 8):
            try:
                t = timed(lambda y, g=g: v3(y, g), x)
                print(f"[{B},{N},{C}] v3 g={g}: {t:7.1f} us/op")
            except Exception as e:
                print(f"[{B},{N},{C}] v3 g={g}: FAIL {str(e)[-140:]}".replace("\n", " "))
        for g in (2, 4, 8):
            try:
                t = timed(lambda y, g=g: v4(y, g), x)
                d = np.abs(np.asarray(jax.jit(lambda y: v4(y, g))(x), np.float32) - ref).max()
                print(f"[{B},{N},{C}] v4 g={g}: {t:7.1f} us/op  max|d|={d:.4f}")
            except Exception as e:
                print(f"[{B},{N},{C}] v4 g={g}: FAIL {str(e)[-140:]}".replace("\n", " "))

    for rows, lanes, dt in [(4096, 128, jnp.bfloat16), (8192, 128, jnp.bfloat16),
                            (32768, 128, jnp.bfloat16)]:
        try:
            t = transpose_probe(rows, lanes, dt)
            mb = rows * lanes * 2 / 1e6
            print(f"transpose [{rows},{lanes}] bf16 ({mb:.1f} MB): {t:7.1f} us/op")
        except Exception as e:
            print(f"transpose [{rows},{lanes}]: FAIL {str(e)[-140:]}".replace("\n", " "))


if __name__ == "__main__":
    main()
