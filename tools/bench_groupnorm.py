"""On-chip measurement: batch-minor Pallas GroupNorm vs the XLA fusion chain.

VERDICT r3 item 3: the packed-lane trick that fixed attention was analyzed
but never prototyped for GroupNorm — this prototypes it (ops/norm.py
``_pallas_forward_bm``) and measures it, two ways:

1. isolated op at the flagship U-Net's level shapes (both FiLM and plain),
2. the full 1000-step north-star sampling chain with the kernel dispatched
   at every GN site (DMN_TPU_PALLAS_NORM_BM=1) vs the XLA path.

Usage: python tools/bench_groupnorm.py [runs]
Prints one JSON line; run on the real chip (the comparison is meaningless
on CPU).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _time(fn, *args, warmup=2, runs=20):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / runs


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.numpy as jnp

    from diffusion_model_nemo_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache(
        os.environ.get("DMN_COMPILE_CACHE_DIR") or "/tmp/dmn_xla_cache"
    )

    from diffusion_model_nemo_tpu.ops import norm

    B = 128
    # flagship dim-32 U-Net level shapes (NHWC), groups=8
    shapes = [(B, 32, 32, 32), (B, 16, 16, 64), (B, 8, 8, 64), (B, 4, 4, 64)]
    rng = np.random.RandomState(0)
    out = {"device": str(jax.devices()[0].device_kind), "runs": runs, "op": {}}

    for shape in shapes:
        _, H, W, C = shape
        x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(C).astype(np.float32))
        beta = jnp.asarray(rng.randn(C).astype(np.float32))
        scale = jnp.asarray(rng.randn(B, 1, 1, C).astype(np.float32))
        shift = jnp.asarray(rng.randn(B, 1, 1, C).astype(np.float32))
        row = {}
        for name, env in (("xla", "0"), ("bm", "1")):
            os.environ["DMN_TPU_PALLAS_NORM_BM"] = env
            f = jax.jit(
                lambda x, g, b, s, h: norm.group_norm_silu(
                    x, g, b, 8, scale_shift=(s, h)
                )
            )
            sec = _time(f, x, gamma, beta, scale, shift, runs=runs)
            row[name] = round(sec * 1e6, 1)  # us
            if name == "bm":
                ref = jax.jit(
                    lambda x, g, b, s, h: norm.group_norm_silu_reference(
                        x, g, b, 8, scale=s, shift=h
                    )
                )(x, gamma, beta, scale, shift)
                got = f(x, gamma, beta, scale, shift)
                err = float(
                    jnp.max(
                        jnp.abs(
                            got.astype(jnp.float32) - ref.astype(jnp.float32)
                        )
                    )
                )
                row["max_abs_err"] = round(err, 5)
        # 1r+1w memory floor for the tensor at 819 GB/s (v5e)
        bytes_rw = 2 * np.prod(shape) * 2
        row["mem_floor_us"] = round(bytes_rw / 819e9 * 1e6, 1)
        out["op"][f"{H}x{W}x{C}"] = row

    # full north-star chain, kernel on vs off
    from __graft_entry__ import _flagship

    chain = {}
    for name, env in (("xla", "0"), ("bm", "1")):
        os.environ["DMN_TPU_PALLAS_NORM_BM"] = env
        model = _flagship(image_size=32, dim=32, dim_mults=(1, 2, 2, 2), timesteps=1000)
        model.init_params(jax.random.PRNGKey(0))
        net, sampler = model.diffusion_model, model.sampler

        def model_fn(p, x, t):
            return net.apply({"params": p}, x, t)

        shape = (B, 32, 32, 3)
        fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
        key = jax.random.PRNGKey(1)
        sec = _time(fused, model.params, key, warmup=1, runs=3)
        chain[name] = {"sps": round(B / sec, 1), "ms_per_step": round(sec, 4)}
    out["chain"] = chain
    out["chain"]["speedup"] = round(
        chain["bm"]["sps"] / chain["xla"]["sps"], 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
