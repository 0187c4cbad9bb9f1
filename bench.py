"""Benchmark: CIFAR-10 32x32 samples/sec/chip at 1000-step DDPM sampling.

The driver-defined north-star metric (BASELINE.json). The reference publishes
no numbers, so ``vs_baseline`` compares the fused jitted ``lax.scan`` sampler
against a reference-style eager loop measured on the same chip: one jit
dispatch per timestep plus a per-step host copy of the image (exactly what
the reference's ``p_sample_loop`` does — gaussian_diffusion.py:170-189).

Also reports MFU so "speed-of-light" is checkable, not asserted: FLOPs come
from XLA's cost analysis of one compiled U-Net forward × NFE (the sampler's
non-network math is negligible), divided by wall time × the chip's peak. A
second leg benches a realistic dim-128 model (1.76M-param dim-32 under-uses
the MXU by construction).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N,
   "mfu_pct": ..., "dim128": {...}}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

T = 1000
IMG = 32

# Peak dense-matmul throughput by device kind (bf16 FLOP/s). The network
# computes in bfloat16 (model cfg dtype), which is what the MXU path uses.
_PEAK_TABLE = {
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,
    "trillium": 918e12,
}


def _peak_flops(device) -> tuple:
    kind = getattr(device, "device_kind", "unknown").lower()
    for k, v in _PEAK_TABLE.items():
        if k in kind:
            return v, kind
    return 197e12, f"{kind} (assumed v5e-class peak)"


def _forward_flops(model_fn, params, shape) -> float:
    """XLA-estimated FLOPs of one compiled network forward at ``shape``.

    Counted with the Pallas attention dispatch forced OFF: custom calls
    report zero flops to XLA's cost analysis, so counting the pure-XLA
    composition keeps the MFU denominator honest (and comparable across
    kernel variants — the math is identical).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((shape[0],), jnp.float32)
    prev = os.environ.get("DMN_TPU_PALLAS_LINATTN")
    os.environ["DMN_TPU_PALLAS_LINATTN"] = "0"
    try:
        compiled = jax.jit(model_fn).lower(params, x, t).compile()
    finally:
        if prev is None:
            os.environ.pop("DMN_TPU_PALLAS_LINATTN", None)
        else:
            os.environ["DMN_TPU_PALLAS_LINATTN"] = prev
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _bench_model(dim: int, batch: int, runs: int, peak: float, tpu_geometry: str = "off") -> dict:
    """Fused-scan sampling throughput + MFU for one model size."""
    import jax

    from __graft_entry__ import _flagship

    model = _flagship(
        image_size=IMG, dim=dim, dim_mults=(1, 2, 2, 2), timesteps=T,
        tpu_geometry=tpu_geometry,
    )
    model.init_params(jax.random.PRNGKey(0))
    params = model.params
    net = model.diffusion_model
    sampler = model.sampler

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    shape = (batch, IMG, IMG, 3)
    fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(1)
    fused(params, key).block_until_ready()  # compile
    t0 = time.perf_counter()
    out = None
    for i in range(runs):
        out = fused(params, jax.random.fold_in(key, i))
    out.block_until_ready()
    sec = (time.perf_counter() - t0) / runs

    flops_total = _forward_flops(model_fn, params, shape) * T
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    return {
        "sps": batch / sec,
        "sec_per_chain": sec,
        "mfu_pct": 100.0 * flops_total / (sec * peak),
        "flops_per_forward": flops_total / T,
        "params": n_params,
        "model_fn": model_fn,
        "model": model,
        "params_tree": params,
        "sampler": sampler,
        "shape": shape,
    }


def _bench_training(
    model, batch_size: int, steps: int = 50,
    fwd_flops: float | None = None, peak: float | None = None,
) -> dict:
    """Sustained full-train-step throughput (loss+grads+AdamW+EMA, donated
    buffers) on the flagship model — the Trainer's device envelope.

    When ``fwd_flops``/``peak`` are given, also reports ``mfu_est_pct`` using
    the standard 3x-forward convention (backward ~= 2x forward) — estimated,
    not XLA-counted, because the update graph includes Pallas custom calls
    that report zero flops to cost analysis."""
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    import numpy as np

    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    tx, _ = build_optimizer(model.cfg.get("optim"), max_steps=1000, grad_clip=1.0)
    params = jax.tree.map(jnp.copy, model.params)
    ema = jax.tree.map(jnp.copy, model.ema_params)
    opt = tx.init(params)
    batch = jax.device_put(
        {
            "image": np.random.randint(0, 255, (batch_size, IMG, IMG, 3), dtype=np.uint8),
            "label": np.zeros((batch_size,), np.int32),
        }
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2, 5))
    def update(params, opt_state, ema_params, batch, base_key, step):
        # key derived in-graph + device-carried step: the Trainer's
        # production pattern (trainer.py:_build_update_fn) — host-created
        # fold_in/asarray(step) per step are extra dispatches that dominate
        # once the device step is fast (measured 7.2k -> 15.5k sps on s2d).
        key = jax.random.fold_in(base_key, step)
        (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
            params, batch, key, step
        )
        u, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, u)
        ema_params = ema_update(ema_params, params, 0.9999, step)
        # grad_norm is a live output so this measures exactly the Trainer's
        # production step (trainer.py:_build_update_fn emits it per step).
        metrics = {"train_loss": loss, "grad_norm": optax.global_norm(g)}
        return params, opt_state, ema_params, step + 1, metrics

    base_key = jax.random.PRNGKey(1)
    step_dev = jnp.asarray(0, jnp.int32)
    for _ in range(3):  # compile + settle
        params, opt, ema, step_dev, metrics = update(
            params, opt, ema, batch, base_key, step_dev
        )
    metrics["train_loss"].block_until_ready()
    # best of 3 windows: the remote dispatch tunnel has multi-second
    # degradation episodes that otherwise land 2x swings in this leg
    # (observed 5.7k vs 11.5k sps for the identical program minutes apart)
    sec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt, ema, step_dev, metrics = update(
                params, opt, ema, batch, base_key, step_dev
            )
        metrics["train_loss"].block_until_ready()
        sec = min(sec, (time.perf_counter() - t0) / steps)
    out = {"sps": round(batch_size / sec, 1), "ms_per_step": round(sec * 1e3, 3)}
    if fwd_flops is not None and peak is not None:
        out["mfu_est_pct"] = round(100.0 * 3.0 * fwd_flops / (sec * peak), 2)
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent XLA compile cache: steady-state numbers are unaffected but a
    # full run pays ~30 min of (remote-tunnel) compiles without it. Opt out
    # with DMN_BENCH_NO_CACHE=1.
    if os.environ.get("DMN_BENCH_NO_CACHE", "0") != "1":
        from diffusion_model_nemo_tpu.utils.compile_cache import (
            enable_persistent_compilation_cache,
        )

        enable_persistent_compilation_cache(
            os.environ.get("DMN_COMPILE_CACHE_DIR") or "/tmp/dmn_xla_cache"
        )

    BATCH = 128  # throughput saturates ~B>=128 on v5e for this net
    peak, device_kind = _peak_flops(jax.devices()[0])

    # ---- flagship dim-32 (the north-star config) -----------------------------
    r32 = _bench_model(dim=32, batch=BATCH, runs=3, peak=peak)
    fused_sps = r32["sps"]

    # ---- reference-style eager loop (baseline emulation) ---------------------
    # One jitted step per t + per-step host transfer, like the reference's
    # Python loop with .cpu() each iteration. Timed over a slice of the chain
    # and scaled (the per-step cost is t-independent). If this leg fails
    # (e.g. compile-service hiccup), fall back to the last measured value so
    # the primary metric still reports — and say so in the JSON.
    baseline_fallback = False
    try:
        sampler, model_fn, params = r32["sampler"], r32["model_fn"], r32["params_tree"]
        shape = r32["shape"]
        key = jax.random.PRNGKey(1)
        step_jit = jax.jit(lambda p, x, t, k: sampler.p_sample(model_fn, p, x, t, k))
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

    # ---- fast-sampler legs: DDIM-50 + score-SDE PC (driver-visible so
    # regressions in the strided/SDE paths show up in BENCH_r*.json) ----------
    ddim50 = None
    distill8 = None
    dpm20 = None
    edm18 = None
    dit50 = None
    pc_sde = None
    dim128 = None
    train = None
    if os.environ.get("DMN_BENCH_FULL", "1") != "0":
        try:
            from diffusion_model_nemo_tpu.modules import GeneralizedGaussianDiffusion

            model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]
            dd = GeneralizedGaussianDiffusion(
                timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=50
            )
            fused = jax.jit(lambda p, k: dd.p_sample_loop(model_fn, p, shape, k))
            key = jax.random.PRNGKey(2)
            fused(params, key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 10
            out = None
            for i in range(RUNS):
                out = fused(params, jax.random.fold_in(key, i))
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            ddim50 = {"sps": round(BATCH / sec, 1), "steps": 50, "eta": 0.0}
        except Exception as e:
            ddim50 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            # the progressive-distillation student's serving configuration:
            # 8-step deterministic DDIM in the v-parameterization
            # (training/distillation.py; throughput-only — random weights
            # like every other leg)
            from diffusion_model_nemo_tpu.modules import GeneralizedGaussianDiffusion

            model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]
            dd8 = GeneralizedGaussianDiffusion(
                timesteps=T,
                schedule_name="cosine",
                eta=0.0,
                ddim_timesteps=8,
                objective="pred_v",
            )
            fused = jax.jit(lambda p, k: dd8.p_sample_loop(model_fn, p, shape, k))
            key = jax.random.PRNGKey(6)
            fused(params, key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 20
            out = None
            for i in range(RUNS):
                out = fused(params, jax.random.fold_in(key, i))
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            distill8 = {"sps": round(BATCH / sec, 1), "steps": 8, "objective": "pred_v"}
        except Exception as e:
            distill8 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            from diffusion_model_nemo_tpu.modules import DPMSolverDiffusion

            model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]
            dpm = DPMSolverDiffusion(
                timesteps=T, schedule_name="cosine", solver_steps=20, solver_order=2
            )
            fused = jax.jit(lambda p, k: dpm.p_sample_loop(model_fn, p, shape, k))
            key = jax.random.PRNGKey(4)
            fused(params, key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 10
            out = None
            for i in range(RUNS):
                out = fused(params, jax.random.fold_in(key, i))
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            dpm20 = {"sps": round(BATCH / sec, 1), "steps": 20, "order": 2}
        except Exception as e:
            dpm20 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            from diffusion_model_nemo_tpu.modules import KarrasDiffusion

            model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]
            kd = KarrasDiffusion(
                timesteps=T, schedule_name="cosine", solver_steps=18, solver_order=2
            )
            fused = jax.jit(lambda p, k: kd.p_sample_loop(model_fn, p, shape, k))
            key = jax.random.PRNGKey(5)
            fused(params, key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 10
            out = None
            for i in range(RUNS):
                out = fused(params, jax.random.fold_in(key, i))
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            edm18 = {"sps": round(BATCH / sec, 1), "steps": 18, "order": 2, "nfe": 35}
        except Exception as e:
            edm18 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            # DiT-S/2 transformer backbone at DDIM-50: the MXU-shaped network
            # (pure [B, N, D] matmuls, modules/dit.py) — driver-visible so the
            # transformer path's throughput/MFU regressions show up.
            from diffusion_model_nemo_tpu.modules import (
                DiT,
                GeneralizedGaussianDiffusion,
            )

            net = DiT(
                dim=384, depth=12, heads=6, patch_size=2, channels=3,
                dtype="bfloat16",
            )
            shape = (BATCH, IMG, IMG, 3)
            xz = jnp.zeros(shape, jnp.float32)
            tz = jnp.zeros((BATCH,), jnp.float32)
            dparams = net.init(jax.random.PRNGKey(8), xz, tz)["params"]

            def dit_fn(p, x, t):
                return net.apply({"params": p}, x, t)

            dd = GeneralizedGaussianDiffusion(
                timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=50
            )
            fused = jax.jit(lambda p, k: dd.p_sample_loop(dit_fn, p, shape, k))
            key = jax.random.PRNGKey(9)
            fused(dparams, key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 5
            out = None
            for i in range(RUNS):
                out = fused(dparams, jax.random.fold_in(key, i))
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            fwd = _forward_flops(dit_fn, dparams, shape)
            dit50 = {
                "sps": round(BATCH / sec, 1),
                "steps": 50,
                "mfu_pct": round(100.0 * fwd * 50 / (sec * peak), 2),
                "params": sum(int(p.size) for p in jax.tree.leaves(dparams)),
                "geometry": "DiT-S/2",
            }
        except Exception as e:
            dit50 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            from diffusion_model_nemo_tpu.modules.sde_lib import VPSDE
            from diffusion_model_nemo_tpu.modules.sde_samplers import (
                PredictorCorrectorSampler,
            )

            model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]
            sde = VPSDE(N=1000)
            pcs = PredictorCorrectorSampler(
                predictor="reverse_diffusion", corrector="langevin", snr=0.16, n_steps=1
            )
            pcs.update_sde(sde)
            fused = jax.jit(lambda p, k: pcs.sample(model_fn, p, shape, k))
            key = jax.random.PRNGKey(3)
            fused(params, key).block_until_ready()
            t0 = time.perf_counter()
            out = fused(params, jax.random.fold_in(key, 1))
            out.block_until_ready()
            sec = time.perf_counter() - t0
            pc_sde = {"sps": round(BATCH / sec, 2), "nfe": 1000 * 2,
                      "predictor": "reverse_diffusion", "corrector": "langevin"}
        except Exception as e:
            pc_sde = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- latent diffusion leg: 1000-step DDPM on f=2 VAE latents -------------
    # Same public workload (CIFAR 32x32 images out) via the LatentDiffusion
    # family: the dim-32 U-Net runs on 16x16x4 latents (4x fewer spatial
    # positions per network call) + ONE decoder pass — the architecture-level
    # route to faster sampling that keeps full-resolution decoding.
    latent = None
    if os.environ.get("DMN_BENCH_FULL", "1") != "0":
        try:
            from diffusion_model_nemo_tpu.models import LatentDiffusion

            ld_cfg = {
                "image_size": IMG,
                "timesteps": T,
                "channels": 3,
                "save_every": 0,
                "first_stage": {
                    "autoencoder": {
                        "_target_": "diffusion_model_nemo.modules.AutoencoderKL",
                        "dim": 32, "dim_mults": [1, 2], "z_channels": 4,
                        "channels": 3, "dtype": "bfloat16",
                    }
                },
                "diffusion_model": {
                    "_target_": "diffusion_model_nemo.modules.Unet",
                    "input_dim": IMG // 2, "dim": 32, "channels": 4,
                    "dim_mults": [1, 2, 2], "dtype": "bfloat16",
                },
                "sampler": {
                    "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                    "timesteps": T, "schedule_name": "cosine",
                },
                "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss",
                         "loss_type": "l2"},
                "optim": {"name": "adamw", "lr": 1e-3},
            }
            ld = LatentDiffusion(cfg=ld_cfg)
            ld.init_params(jax.random.PRNGKey(0))
            key = jax.random.PRNGKey(7)
            ld.sample(batch_size=BATCH, image_size=IMG, key=key).block_until_ready()
            t0 = time.perf_counter()
            RUNS = 3
            out = None
            for i in range(RUNS):
                out = ld.sample(
                    batch_size=BATCH, image_size=IMG, key=jax.random.fold_in(key, i)
                )
            out.block_until_ready()
            sec = (time.perf_counter() - t0) / RUNS
            n_unet = sum(int(p.size) for p in jax.tree.leaves(ld.params))
            latent = {
                "sps": round(BATCH / sec, 1), "steps": T, "latent": "16x16x4",
                "unet_params": n_unet,
            }
        except Exception as e:
            latent = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- opt-in TPU-geometry fast path (tpu_geometry: s2d) -------------------
    # Same public workload (CIFAR 32x32 in/out, 1000-step DDPM) on the
    # space-to-depth variant: every U-Net level at half spatial resolution.
    # A different architecture trained with the flag on (modules/unet.py) —
    # reported separately; the parity model stays the headline.
    s2d = None
    if os.environ.get("DMN_BENCH_FULL", "1") != "0":
        try:
            rs2d = _bench_model(dim=32, batch=BATCH, runs=3, peak=peak,
                                tpu_geometry="s2d")
            s2d = {
                "sps": round(rs2d["sps"], 4),
                "mfu_pct": round(rs2d["mfu_pct"], 2),
                "params": rs2d["params"],
                "tpu_geometry": "s2d",
            }
            try:  # s2d training envelope (same full update as `train` below)
                s2d["train"] = _bench_training(
                    rs2d["model"], BATCH,
                    fwd_flops=rs2d["flops_per_forward"], peak=peak,
                )
            except Exception as e:
                s2d["train"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        except Exception as e:
            s2d = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- realistic model size: dim-128 ---------------------------------------
    # 8x better MXU efficiency than dim-32 (STATUS r1); skippable for quick
    # runs via DMN_BENCH_FULL=0.
    if os.environ.get("DMN_BENCH_FULL", "1") != "0":
        try:
            r128 = _bench_model(dim=128, batch=BATCH, runs=1, peak=peak)
            dim128 = {
                "sps": round(r128["sps"], 4),
                "mfu_pct": round(r128["mfu_pct"], 2),
                "params": r128["params"],
            }
            try:  # training MFU at realistic model scale
                dim128["train"] = _bench_training(
                    r128["model"], BATCH, steps=20,
                    fwd_flops=r128["flops_per_forward"], peak=peak,
                )
            except Exception as e:
                dim128["train"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        except Exception as e:  # report the primary metric regardless
            dim128 = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            train = _bench_training(
                r32["model"], BATCH,
                fwd_flops=r32["flops_per_forward"], peak=peak,
            )
        except Exception as e:
            train = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- serving-path throughput (production daemon, DDIM-50) ----------------
    # End-to-end images/sec through BatchingSampler.submit(): request queue ->
    # coalescing -> fixed-shape device batch -> on-device uint8 -> per-request
    # slices. Compare with `ddim50` above to read off the serving overhead.
    # Runs LAST: change_sampler mutates the flagship model object.
    serving = None
    if os.environ.get("DMN_BENCH_FULL", "1") != "0":
        try:
            import threading

            from diffusion_model_nemo_tpu.serving import BatchingSampler

            model = r32["model"]
            model.change_sampler(
                {
                    "_target_": "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
                    "timesteps": T,
                    "schedule_name": "cosine",
                    "eta": 0.0,
                    "ddim_timesteps": 50,
                }
            )
            b = BatchingSampler(
                model, image_size=IMG, max_batch=BATCH, linger_ms=5.0, use_ema=False
            )
            b.start(warmup=True)
            N_REQ, PER = 64, 16
            errors = []

            def client(i):
                try:
                    out = b.submit(PER, timeout=1200)
                    assert out.shape[0] == PER
                except Exception as e:  # surfaced in the JSON
                    errors.append(f"{type(e).__name__}: {e}"[:120])

            threads = [threading.Thread(target=client, args=(i,)) for i in range(N_REQ)]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            stats = b.snapshot_stats()
            b.stop()
            serving = {
                "images_per_sec": round(N_REQ * PER / wall, 1),
                "ddim_steps": 50,
                "requests": N_REQ,
                "images_per_request": PER,
                "mean_latency_ms": stats.get("avg_request_latency_ms"),
                "batch_fill": stats.get("avg_batch_fill"),
                "errors": errors[:2],
            }
        except Exception as e:
            serving = {"error": f"{type(e).__name__}: {e}"[:200]}

    result = {
        "metric": "CIFAR-10 32x32 samples/sec/chip, 1000-step DDPM (fused lax.scan sampler)",
        "value": round(fused_sps, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(fused_sps / eager_sps, 3),
        "baseline": "reference-style per-step dispatch + host sync on same chip",
        "baseline_value": round(eager_sps, 4),
        "baseline_fallback": baseline_fallback,
        "mfu_pct": round(r32["mfu_pct"], 2),
        "flops_per_forward": r32["flops_per_forward"],
        "device_kind": device_kind,
        "peak_bf16_flops": peak,
        "ddim50": ddim50,
        "distill8": distill8,
        "dpm20": dpm20,
        "edm18": edm18,
        "dit50": dit50,
        "pc_sde": pc_sde,
        "latent1000": latent,
        "tpu_s2d": s2d,
        "dim128": dim128,
        "train": train,
        "serving": serving,
        "batch": BATCH,
        "timesteps": T,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
