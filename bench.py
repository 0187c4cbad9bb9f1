"""Benchmark: CIFAR-10 32x32 samples/sec/chip at 1000-step DDPM sampling.

The driver-defined north-star metric (BASELINE.json). The reference publishes
no numbers, so ``vs_baseline`` compares the fused jitted ``lax.scan`` sampler
against a reference-style eager loop measured on the same chip: one jit
dispatch per timestep plus a per-step host copy of the image (exactly what
the reference's ``p_sample_loop`` does — gaussian_diffusion.py:170-189).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    BATCH = 128  # throughput saturates ~B>=128 on v5e for this net
    T = 1000
    IMG = 32

    model = _flagship(image_size=IMG, dim=32, dim_mults=(1, 2, 2, 2), timesteps=T)
    model.init_params(jax.random.PRNGKey(0))
    params = model.params
    net = model.diffusion_model
    sampler = model.sampler

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    shape = (BATCH, IMG, IMG, 3)

    # ---- fused scan sampler (ours) -----------------------------------------
    fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(1)
    fused(params, key).block_until_ready()  # compile
    runs = 3
    t0 = time.perf_counter()
    for i in range(runs):
        out = fused(params, jax.random.fold_in(key, i))
    out.block_until_ready()
    fused_time = (time.perf_counter() - t0) / runs
    fused_sps = BATCH / fused_time

    # ---- reference-style eager loop (baseline emulation) ---------------------
    # One jitted step per t + per-step host transfer, like the reference's
    # Python loop with .cpu() each iteration. Timed over a slice of the chain
    # and scaled (the per-step cost is t-independent). If this leg fails
    # (e.g. compile-service hiccup), fall back to the last measured value so
    # the primary metric still reports — and say so in the JSON.
    baseline_fallback = False
    try:
        step_jit = jax.jit(
            lambda p, x, t, k: sampler.p_sample(model_fn, p, x, t, k)
        )
        x = jax.random.normal(key, shape)
        t_b = jnp.full((BATCH,), T - 1, jnp.int32)
        np.asarray(step_jit(params, x, t_b, key))  # compile
        SLICE = 20
        t0 = time.perf_counter()
        for i in range(SLICE):
            t_b = jnp.full((BATCH,), T - 1 - i, jnp.int32)
            x = step_jit(params, x, t_b, jax.random.fold_in(key, i))
            _ = np.asarray(x)  # host copy per step, like the reference
        eager_time = (time.perf_counter() - t0) / SLICE * T
        eager_sps = BATCH / eager_time
    except Exception:
        eager_sps = 1.386  # measured on this chip at B=128 (2026-08-16)
        baseline_fallback = True

    result = {
        "metric": "CIFAR-10 32x32 samples/sec/chip, 1000-step DDPM (fused lax.scan sampler)",
        "value": round(fused_sps, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(fused_sps / eager_sps, 3),
        "baseline": "reference-style per-step dispatch + host sync on same chip",
        "baseline_value": round(eager_sps, 4),
        "baseline_fallback": baseline_fallback,
        "batch": BATCH,
        "timesteps": T,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
