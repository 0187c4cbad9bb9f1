"""Measure DiT backbone throughput on the real chip at CIFAR geometry.

DiT-S/2 at 32x32 (dim 384, depth 12, heads 6, patch 2 -> 256 tokens, ~32M
params, bf16 compute): 1000-step ancestral chain, DDIM-50, and the full
train step — the transformer counterpart of bench.py's U-Net legs, with the
same honest-MFU convention (FLOPs from the pure-XLA composition).

Usage: python tools/bench_dit.py [--dim 384 --depth 12 --batch 128 --runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_xla_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--patch", type=int, default=2)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=32)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-1000", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _forward_flops, _peak_flops
    from diffusion_model_nemo_tpu.config import from_dict
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    dev = jax.devices()[0]
    peak, kind = _peak_flops(dev)
    print(f"device: {dev} ({kind}, peak {peak/1e12:.0f} TFLOP/s bf16)")

    model = DDPM(
        cfg=from_dict(
            {
                "image_size": args.image,
                "timesteps": args.timesteps,
                "channels": 3,
                "save_every": 0,
                "diffusion_model": {
                    "_target_": "diffusion_model_nemo.modules.DiT",
                    "dim": args.dim,
                    "depth": args.depth,
                    "heads": args.heads,
                    "patch_size": args.patch,
                    "channels": 3,
                    "dtype": "bfloat16",
                },
                "sampler": {
                    "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                    "timesteps": args.timesteps,
                    "schedule_name": "cosine",
                },
                "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
                "optim": {"name": "adamw", "lr": 2e-4, "weight_decay": 0.0},
            }
        )
    )
    model.init_params(jax.random.PRNGKey(0))
    params = model.params
    net = model.diffusion_model
    sampler = model.sampler
    shape = (args.batch, args.image, args.image, 3)

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    fwd_flops = _forward_flops(model_fn, params, shape)
    print(f"params: {n_params/1e6:.1f}M, forward: {fwd_flops/1e9:.1f} GFLOP @ B={args.batch}")

    results = {"params_m": n_params / 1e6, "batch": args.batch}

    def bench(label, fn, key, nfe):
        fn(params, key).block_until_ready()  # compile
        t0 = time.perf_counter()
        out = None
        for i in range(args.runs):
            out = fn(params, jax.random.fold_in(key, i))
        out.block_until_ready()
        sec = (time.perf_counter() - t0) / args.runs
        sps = args.batch / sec
        mfu = 100.0 * fwd_flops * nfe / (sec * peak)
        print(f"{label}: {sps:.1f} samples/s ({sec*1e3:.1f} ms/chain, {mfu:.1f}% MFU)")
        results[label] = {"sps": round(sps, 1), "mfu_pct": round(mfu, 2)}

    # DDIM-50
    from diffusion_model_nemo_tpu.modules import GeneralizedGaussianDiffusion

    ddim_steps = min(50, args.timesteps)
    ddim = GeneralizedGaussianDiffusion(
        timesteps=args.timesteps, schedule_name="cosine", eta=0.0, ddim_timesteps=ddim_steps
    )
    bench(
        f"ddim{ddim_steps}",
        jax.jit(lambda p, k: ddim.p_sample_loop(model_fn, p, shape, k)),
        jax.random.PRNGKey(1),
        ddim_steps,
    )

    if not args.skip_1000:
        bench(
            "ddpm1000",
            jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k)),
            jax.random.PRNGKey(2),
            args.timesteps,
        )

    # full train step (loss+grad+AdamW+EMA), same convention as bench.py's
    # train legs: est. 3x forward FLOPs + optimizer tail in the MFU estimate
    import optax
    from functools import partial

    import numpy as np

    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    tx, _ = build_optimizer(model.cfg.get("optim"), max_steps=1000, grad_clip=1.0)
    opt = tx.init(params)
    ema = jax.tree.map(jnp.copy, params)
    batch = {"image": np.random.RandomState(0).randint(0, 255, shape, np.uint8)}
    batch = jax.tree.map(jnp.asarray, batch)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def update(p, o, e, b, key, step):
        (loss, _), grads = jax.value_and_grad(model.training_step, has_aux=True)(
            p, b, key, step
        )
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        e = ema_update(e, p, 0.9999, step)
        return p, o, e, loss

    key = jax.random.PRNGKey(3)
    params, opt, ema, _ = update(params, opt, ema, batch, key, jnp.asarray(0))  # compile
    jax.block_until_ready(params)
    steps = 30
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, ema, loss = update(
            params, opt, ema, batch, jax.random.fold_in(key, i), jnp.asarray(i)
        )
    jax.block_until_ready(loss)
    sec = (time.perf_counter() - t0) / steps
    sps = args.batch / sec
    mfu = 100.0 * 3 * fwd_flops / (sec * peak)
    print(f"train: {sps:.1f} samples/s ({sec*1e3:.2f} ms/step, est {mfu:.1f}% MFU)")
    results["train"] = {"sps": round(sps, 1), "est_mfu_pct": round(mfu, 2)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
