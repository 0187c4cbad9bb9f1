"""Microbench: tap-split Pallas conv vs XLA conv at flagship level-0 shapes.

Usage: python tools/microbench_conv.py [B H W C F ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, runs=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e6  # us


REPS = 500  # tunnel RTT is ~30 ms; amortize it well below the per-op time


def bench_ingraph(step, x, rounds=5):
    """In-graph repetition (fori_loop) — per-dispatch timing through the
    remote-compile tunnel is 2-4x noisy on this rig; chaining REPS
    applications inside one jit isolates device time. ``step`` must be
    shape-preserving (C == F)."""
    c = jax.jit(lambda x: jax.lax.fori_loop(0, REPS, lambda i, y: step(y), x))
    jax.block_until_ready(c(x))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(c(x))
        ts.append((time.perf_counter() - t0) / REPS * 1e6)
    return float(np.median(ts))


def main():
    from diffusion_model_nemo_tpu.ops.conv import (
        conv3x3_reference,
        conv3x3_tap_split,
        pack_tap_split_weights,
        _pallas_conv3x3,
    )

    shapes = [
        (128, 32, 32, 32, 32),   # L0 block conv
        (128, 32, 32, 64, 32),   # up-path concat conv (64 -> 32)
        (128, 16, 16, 64, 64),   # L1 block conv
        # tpu_geometry=pad candidates: the L0 conv zero-padded to wider MXU
        # lanes. Compare wall time (not GF/ms) against the (...,32,32) row —
        # padding only pays if the padded conv is FASTER in absolute time.
        (128, 32, 32, 64, 64),   # L0 padded 32->64
        (128, 32, 32, 128, 128), # L0 padded 32->128
        # tpu_geometry=s2d equivalent L0 shape (half spatial, same channels)
        (128, 16, 16, 32, 32),
    ]
    key = jax.random.PRNGKey(0)
    for (B, H, W, C, F) in shapes:
        x = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)
        # bf16 weights: the flagship computes in bf16 (mixed f32-weight convs
        # take a different, slower XLA path and would mis-rank candidates)
        w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, F), jnp.float32) * 0.1).astype(jnp.bfloat16)
        b = (jax.random.normal(jax.random.fold_in(key, 2), (F,), jnp.float32) * 0.1).astype(jnp.bfloat16)

        ref = jax.jit(lambda x, w, b: conv3x3_reference(x, w, b))
        if C == F:
            t_ref = bench_ingraph(lambda y: conv3x3_reference(y, w, b), x)
        else:
            t_ref = bench(ref, x, w, b)

        wp = pack_tap_split_weights(w).astype(jnp.bfloat16)
        b2 = b.reshape(1, -1).astype(jnp.bfloat16)
        flops = 2 * B * H * W * 9 * C * F
        print(f"[{B},{H},{W},{C}->{F}] xla {t_ref:8.1f} us ({flops/t_ref/1e6:6.1f} GF/ms)")
        for g in (4, 8, 16, 32):
            if B % g:
                continue
            try:
                pal = jax.jit(lambda x, wp, b2, g=g: _pallas_conv3x3(x, wp, b2, F, g))
                t = bench(pal, x, wp, b2)
                d = np.abs(
                    np.asarray(pal(x, wp, b2), np.float32) - np.asarray(ref(x, w, b), np.float32)
                ).max()
                print(f"   tap-split g={g:3d}: {t:8.1f} us ({flops/t/1e6:6.1f} GF/ms)  max|d|={d:.4f}")
            except Exception as e:
                print(f"   tap-split g={g:3d}: FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
