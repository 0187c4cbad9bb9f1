"""A/B: composed (XLA qkv matmul + Pallas attn kernel) vs qkv-fused kernel v3.

In-graph repetition; both arms map [B,N,C]->[B,N,C] via the out projection so
the loop composes. Usage: python tools/microbench_attn_v3.py
"""
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
        ts.append((time.perf_counter()-t0)/REPS*1e6)
    return float(np.median(ts))

def main():
    from diffusion_model_nemo_tpu.ops.attention import (
        fused_linear_attention_qkv, _pallas_linattn_qkv_fused)
    heads, dim_head = 4, 32
    hd = heads*dim_head; scale = dim_head**-0.5
    for (B,N,C) in [(128,1024,32),(128,256,64)]:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k,(B,N,C),jnp.float32).astype(jnp.bfloat16)
        wqkv = (jax.random.normal(jax.random.fold_in(k,1),(C,3*hd))*0.1)
        wout = (jax.random.normal(jax.random.fold_in(k,2),(hd,C))*0.1)
        def composed(x):
            qkv = jnp.dot(x, wqkv.astype(x.dtype))
            a = fused_linear_attention_qkv(qkv, heads, dim_head, scale)
            return jnp.dot(a.astype(x.dtype), wout.astype(x.dtype))
        def v3(x, g=None):
            a = _pallas_linattn_qkv_fused(x, wqkv, heads, dim_head, scale, block_g=g)
            return jnp.dot(a.astype(x.dtype), wout.astype(x.dtype))
        t0 = timed(composed, x)
        print(f"[{B},{N},{C}] composed: {t0:7.1f} us/op")
        ref = np.asarray(jax.jit(composed)(x), np.float32)
        for g in (1,2,4,8):
            try:
                t = timed(lambda y,g=g: v3(y,g), x)
                d = np.abs(np.asarray(jax.jit(lambda y: v3(y,g))(x),np.float32)-ref).max()
                print(f"[{B},{N},{C}] v3 g={g}: {t:7.1f} us/op  max|d|={d:.4f}")
            except Exception as e:
                print(f"[{B},{N},{C}] v3 g={g}: FAIL {str(e)[-120:]}".replace("\n"," "))

if __name__ == "__main__":
    main()
