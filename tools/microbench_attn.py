"""Microbench: linear-attention block paths at flagship shapes.

Compares the production composed path (XLA norms/projections + Pallas qkv
kernel), the v1 per-sample block kernel, and the v2 token-batched block
kernel. Each arm is repeated in-graph (fori_loop) so per-dispatch tunnel
latency cancels out; arms run interleaved to cancel shared-rig drift.
Usage: python tools/microbench_attn.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50  # in-graph repetitions per timing call


def timed(compiled, x, rounds=5):
    """Median of `rounds` timings of the in-graph REPS loop, in us/op."""
    compiled(x).block_until_ready()
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        compiled(x).block_until_ready()
        ts.append((time.perf_counter() - t0) / REPS * 1e6)
    return float(np.median(ts))


def looped(fn):
    return jax.jit(lambda x: jax.lax.fori_loop(0, REPS, lambda i, y: fn(y), x))


def main():
    from diffusion_model_nemo_tpu.ops.attention import (
        _gn1,
        fused_linear_attention_qkv,
        _pallas_linear_attention_block,
        _pallas_linear_attention_block_v2,
    )

    heads, dim_head = 4, 32
    hd = heads * dim_head
    scale = dim_head**-0.5

    for (B, N, C) in [(128, 1024, 32), (128, 256, 64)]:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (B, N, C), jnp.float32).astype(jnp.bfloat16)
        ng = jnp.ones((C,)); nb = jnp.zeros((C,))
        wqkv = jax.random.normal(jax.random.fold_in(k, 1), (C, 3 * hd)) * 0.1
        wout = jax.random.normal(jax.random.fold_in(k, 2), (hd, C)) * 0.1
        bout = jax.random.normal(jax.random.fold_in(k, 3), (C,)) * 0.1
        og = jnp.ones((C,)); ob = jnp.zeros((C,))

        def composed(x):
            h = _gn1(x, ng, nb, 1e-5)
            qkv = jnp.dot(h, wqkv.astype(h.dtype))
            attn = fused_linear_attention_qkv(qkv, heads, dim_head, scale)
            out = jnp.dot(attn.astype(x.dtype), wout.astype(x.dtype)) + bout.astype(x.dtype)
            out = _gn1(out, og, ob, 1e-5)
            return out + x

        arms = {"composed": looped(composed)}
        arms["v1"] = looped(lambda y: _pallas_linear_attention_block(
            y, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, 1e-5))
        for g in (1, 2, 4, 8):
            if B % g:
                continue
            arms[f"v2 g={g}"] = looped(lambda y, g=g: _pallas_linear_attention_block_v2(
                y, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale,
                1e-5, block_g=g))

        ref = np.asarray(jax.jit(composed)(x), np.float32)
        results = {}
        for name, fn in arms.items():
            try:
                results[name] = timed(fn, x)
            except Exception as e:
                results[name] = None
                print(f"[{B},{N},{C}] {name}: FAIL {str(e)[-140:]}".replace("\n", " "))
        for name, t in results.items():
            if t is not None:
                print(f"[{B},{N},{C}] {name:12s}: {t:8.1f} us/op")
        # correctness of the best v2
        for g in (4, 2, 1):
            try:
                got = _pallas_linear_attention_block_v2(
                    x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale,
                    1e-5, block_g=g)
                d = np.abs(np.asarray(got, np.float32) - ref).max()
                print(f"[{B},{N},{C}] v2 g={g} max|d|={d:.4f}")
                break
            except Exception:
                continue


if __name__ == "__main__":
    main()
