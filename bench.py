"""Benchmark: CIFAR-10 32x32 samples/sec/chip at 1000-step DDPM sampling.

The driver-defined north-star metric (BASELINE.json). The reference publishes
no numbers, so ``vs_baseline`` compares the fused jitted ``lax.scan`` sampler
against a reference-style eager loop measured on the same chip: one jit
dispatch per timestep plus a per-step host copy of the image (exactly what
the reference's ``p_sample_loop`` does — gaussian_diffusion.py:170-189).

Timeout-proof by construction (the round-3 driver record was rc=124 with no
output): the north-star leg runs FIRST and its JSON line is printed/flushed
immediately; every further leg re-prints the updated line when it lands; a
wall-clock budget (``DMN_BENCH_BUDGET_S``, default 1500s) is enforced both
cooperatively (legs that cannot fit are reported ``{"skipped": "budget"}``)
and preemptively (a watchdog thread prints the final JSON and exits 0 even
if a device call hangs mid-leg). The driver should always get a parseable
line with every leg present-or-explicitly-skipped.

Also reports MFU and ``sol_pct`` so "speed-of-light" is checkable, not
asserted: FLOPs come from XLA's cost analysis of one compiled U-Net forward
× NFE (the sampler's non-network math is negligible); ``sol_pct`` is the
achieved fraction of the physical roofline chain time
``NFE * max(flops/peak_flops, bytes_min/hbm_bw)`` where ``bytes_min`` is
the indisputable per-call HBM floor (input + output + one bf16 param read).
XLA's full "bytes accessed" is reported (``bytes_per_forward``) but is not
the denominator: it counts operand traffic that stays VMEM-resident across
scan steps, and the measured chain beats it.

Quality leg (``quality``): fixed-seed 300-step training run on a structured
synthetic task + random-extractor FID of its samples — numeric quality
regression tracking round-over-round (NOT comparable to published FID).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

# Overridable for smoke-testing on CPU (driver runs with the defaults).
T = int(os.environ.get("DMN_BENCH_T", "1000"))
IMG = 32
BATCH = int(os.environ.get("DMN_BENCH_BATCH", "128"))  # saturates ~B>=128 on v5e

# Peak dense-matmul throughput (bf16 FLOP/s) and HBM bandwidth (byte/s) by
# device kind. The network computes in bfloat16 (model cfg dtype), which is
# what the MXU path uses.
_PEAK_TABLE = {
    "v5 lite": (197e12, 819e9),  # TPU v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
    "trillium": (918e12, 1640e9),
}

# ---------------------------------------------------------------------------
# Incremental result state: re-printed (flushed) after every completed leg so
# a hard kill at any point still leaves the latest parseable JSON line in the
# driver tail.
# ---------------------------------------------------------------------------
_LOCK = threading.Lock()
_STATE = {
    "metric": "CIFAR-10 32x32 samples/sec/chip, 1000-step DDPM (fused lax.scan sampler)",
    "value": None,
    "unit": "samples/sec/chip",
    "vs_baseline": None,
    "batch": BATCH,
    "timesteps": T,
}
_DEADLINE = [float("inf")]  # monotonic deadline, set in main()


# Every leg main() can run, in execution order: the watchdog (and the
# northstar-failure path) mark any never-reached leg {"skipped": ...} so the
# record always has every leg present-or-explicitly-skipped, even when the
# budget expires mid-run (the r5 rehearsal hit this: a degraded-tunnel run
# expired mid-s2d and the later legs were silently absent).
_ALL_LEGS = (
    "baseline_eager", "parity", "ref_topo", "train", "ddim50", "distill8",
    "bpd", "step_budget", "b256", "serving", "latent1000", "dpm20", "edm18",
    "pc_sde", "quality", "dim128", "tpu_s2d", "dit50",
)

# Per-leg headline number for the compact summary line (default: "sps").
_PRIMARY = {
    "serving": "images_per_sec",
    "quality": "fid_rand",
    "bpd": "bpd",
    "parity": None,  # whole (2-number) dict kept verbatim
    "step_budget": None,
    "train_budget": None,
}


def _compact_state(state: dict) -> dict:
    """A <1500-char summary of the full record.

    The driver captures only the last ~2000 chars of stdout and parses the
    last JSON line it finds there; by round 4 the full cumulative line grew
    past that window and the headline ``value`` was truncated out
    (BENCH_r04.json ``parsed: null``). This line is printed LAST after every
    leg and carries the headline + one number per leg, so any kill point
    still leaves a short parseable record (tests/test_bench_smoke.py pins
    the size bound with every leg populated).
    """
    out = {"compact": True}
    for k in ("metric", "value", "unit", "vs_baseline", "mfu_pct", "sol_pct",
              "topology", "baseline_value", "baseline_error", "budget_expired",
              "batch", "timesteps", "wall_s_total"):
        if k in state:
            out[k] = state[k]
    legs = {}
    for name, v in state.items():
        if not isinstance(v, dict):
            continue
        if "skipped" in v:
            legs[name] = "skip"
        elif "error" in v:
            legs[name] = "err"
        elif _PRIMARY.get(name, "sps") is None:
            # small dicts carried whole (parity, step_budget, train_budget)
            out[name] = {k2: v2 for k2, v2 in v.items() if k2 != "wall_s"}
        else:
            legs[name] = v.get(_PRIMARY.get(name, "sps"), "ok")
    if legs:
        out["legs"] = legs
    return out


def _emit() -> None:
    with _LOCK:
        state = {k: v for k, v in _STATE.items() if not k.startswith("_")}
    print(json.dumps(state), flush=True)
    # compact summary LAST (the line the driver's tail window parses)
    print(json.dumps(_compact_state(state)), flush=True)


def _set(key: str, value) -> None:
    with _LOCK:
        _STATE[key] = value


def _remaining() -> float:
    return _DEADLINE[0] - time.monotonic()


def _run_leg(name: str, fn, est_s: float = 60.0, emit: bool = True):
    """Run one leg with budget accounting; record result/error/skip under
    ``name`` and re-print the JSON line. Returns the leg's raw result
    (callers may also want its data) or None."""
    if _remaining() < est_s:
        _set(name, {"skipped": "budget"})
        if emit:
            _emit()
        return None
    _set("_in_progress", name)
    t0 = time.perf_counter()
    try:
        res = fn()
        if isinstance(res, dict):
            res.setdefault("wall_s", round(time.perf_counter() - t0, 1))
    except Exception as e:  # leg failures are reported, never fatal
        res = {
            "error": f"{type(e).__name__}: {e}"[:200],
            "wall_s": round(time.perf_counter() - t0, 1),
        }
    _set(name, res)
    _set("_in_progress", None)
    if emit:
        _emit()
    return res


def _install_watchdog(budget_s: float) -> None:
    """Print the final JSON and exit 0 at the deadline even if the main
    thread is hung inside a device call (the r03 failure mode: a degraded
    compile tunnel stalls any leg indefinitely)."""
    _DEADLINE[0] = time.monotonic() + budget_s

    def watch():
        while True:
            dt = _DEADLINE[0] - time.monotonic()
            if dt <= 0:
                break
            time.sleep(min(dt, 5.0))
        with _LOCK:
            cur = _STATE.pop("_in_progress", None)
            if cur:
                _STATE[cur] = {"skipped": "budget_expired_mid_leg"}
            for leg in _ALL_LEGS:  # never-reached legs: explicit, not absent
                if leg == "baseline_eager" and (
                    _STATE.get("vs_baseline") is not None
                    or "baseline_error" in _STATE
                ):
                    continue  # ran successfully; merged into vs_baseline
                _STATE.setdefault(leg, {"skipped": "budget_expired"})
            _STATE["budget_expired"] = True
        _emit()
        os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


def _peak_flops(device) -> tuple:
    kind = getattr(device, "device_kind", "unknown").lower()
    for k, (fl, bw) in _PEAK_TABLE.items():
        if k in kind:
            return fl, bw, kind
    return 197e12, 819e9, f"{kind} (assumed v5e-class peak)"


def _forward_costs(model_fn, params, shape) -> tuple:
    """XLA-estimated (flops, bytes accessed) of one compiled network forward.

    Counted with the Pallas attention dispatch forced OFF: custom calls
    report zero flops/bytes to XLA's cost analysis, so counting the pure-XLA
    composition keeps the MFU/roofline denominators honest (and comparable
    across kernel variants — the math is identical).
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
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _bench_model(dim: int, batch: int, runs: int, peak: float, hbm_bw: float,
                 tpu_geometry: str = "off", windows: int = 2,
                 dim_mults=(1, 2, 2, 2)) -> dict:
    """Fused-scan sampling throughput + MFU + roofline SoL for one model
    size. Best-of-``windows`` timing (tunnel degradation episodes)."""
    import jax

    from __graft_entry__ import _flagship

    model = _flagship(
        image_size=IMG, dim=dim, dim_mults=tuple(dim_mults), timesteps=T,
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
    sec = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        out = None
        for i in range(runs):
            out = fused(params, jax.random.fold_in(key, w * runs + i))
        out.block_until_ready()
        sec = min(sec, (time.perf_counter() - t0) / runs)

    fwd_flops, fwd_bytes = _forward_costs(model_fn, params, shape)
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    # Physical roofline floor per network call: MXU time on the XLA-counted
    # flops vs HBM time on the INDISPUTABLE minimum traffic (input + output
    # + one bf16 read of the params). XLA's full "bytes accessed" is NOT a
    # valid denominator here — it counts operand traffic that stays
    # VMEM-resident across scan steps, and the measured chain beats it
    # (sol > 100%), so it is reported for reference only.
    io_bytes = 2 * int(np.prod(shape)) * 4 + n_params * 2
    t_floor = T * max(fwd_flops / peak, io_bytes / hbm_bw)
    bound = "compute" if fwd_flops / peak >= io_bytes / hbm_bw else "memory"
    return {
        "sps": batch / sec,
        "sec_per_chain": sec,
        "mfu_pct": 100.0 * fwd_flops * T / (sec * peak),
        "sol_pct": 100.0 * t_floor / sec,
        "bound": bound,
        "flops_per_forward": fwd_flops,
        "bytes_per_forward": fwd_bytes,
        "params": n_params,
        "model_fn": model_fn,
        "model": model,
        "params_tree": params,
        "sampler": sampler,
        "shape": shape,
    }


def _bench_training(
    model, batch_size: int, steps: int = 50, windows: int = 3,
    fwd_flops: float | None = None, peak: float | None = None,
    scan_steps: int = 0, profile: bool = False,
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
    # best of N windows: the remote dispatch tunnel has multi-second
    # degradation episodes that otherwise land 2x swings in this leg
    # (observed 5.7k vs 11.5k sps for the identical program minutes apart)
    sec = float("inf")
    for _ in range(windows):
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

    if profile:
        # Per-category DEVICE time of the single-dispatch update: compared
        # against ms_per_step (wall), the gap is host/tunnel dispatch — the
        # measured decomposition VERDICT r4 #4 asked for.
        try:
            from diffusion_model_nemo_tpu.utils.profiling import profile_categories

            NP = 3

            def run_profiled():
                nonlocal params, opt, ema, step_dev, metrics
                for _ in range(NP):
                    params, opt, ema, step_dev, metrics = update(
                        params, opt, ema, batch, base_key, step_dev
                    )
                metrics["train_loss"].block_until_ready()

            total_ms, by_cat, _ = profile_categories(run_profiled)
            if total_ms > 0:
                top = sorted(by_cat.items(), key=lambda kv: -kv[1])[:6]
                bud = {k: round(v / NP * 1e3, 1) for k, v in top}
                bud["rest"] = round(
                    (total_ms - sum(v for _, v in top)) / NP * 1e3, 1
                )
                bud["device_total"] = round(total_ms / NP * 1e3, 1)
                out["budget_us"] = bud
        except Exception as e:
            out["budget_us"] = {"error": f"{type(e).__name__}: {e}"[:120]}

    if scan_steps > 1:
        # Production multi-step dispatch (`trainer.steps_per_execution: K` —
        # training/trainer.py): K full optimizer steps per device dispatch as
        # one lax.scan. Separates device time from the per-dispatch tunnel
        # round-trip that bounds the single-step number above (VERDICT r4 #4:
        # the train-MFU attack at parity geometry).
        K = scan_steps

        @partial(jax.jit, donate_argnums=(0, 1, 2, 5))
        def update_scan(params, opt_state, ema_params, batch, base_key, step0):
            def body(carry, i):
                p, o, e = carry
                key = jax.random.fold_in(base_key, step0 + i)
                (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
                    p, batch, key, step0 + i
                )
                u, o = tx.update(g, o, p)
                p = optax.apply_updates(p, u)
                e = ema_update(e, p, 0.9999, step0 + i)
                return (p, o, e), {"train_loss": loss, "grad_norm": optax.global_norm(g)}

            (params, opt_state, ema_params), m = jax.lax.scan(
                body, (params, opt_state, ema_params), jnp.arange(K)
            )
            return params, opt_state, ema_params, step0 + K, jax.tree.map(lambda a: a[-1], m)

        for _ in range(2):  # compile + settle
            params, opt, ema, step_dev, metrics = update_scan(
                params, opt, ema, batch, base_key, step_dev
            )
        metrics["train_loss"].block_until_ready()
        ssec = float("inf")
        n_disp = max(steps // K, 1)
        for _ in range(min(windows, 2)):
            t0 = time.perf_counter()
            for _ in range(n_disp):
                params, opt, ema, step_dev, metrics = update_scan(
                    params, opt, ema, batch, base_key, step_dev
                )
            metrics["train_loss"].block_until_ready()
            ssec = min(ssec, (time.perf_counter() - t0) / (n_disp * K))
        out[f"scan{K}"] = {
            "sps": round(batch_size / ssec, 1),
            "ms_per_step": round(ssec * 1e3, 3),
        }
        if fwd_flops is not None and peak is not None:
            out[f"scan{K}"]["mfu_est_pct"] = round(
                100.0 * 3.0 * fwd_flops / (ssec * peak), 2
            )
    return out


def _sampler_leg(diffusion, model_fn, params, shape, runs: int, key_seed: int,
                 extra: dict, windows: int = 3) -> dict:
    """Generic fused-sampler throughput leg. Best of ``windows`` timing
    windows: the remote dispatch tunnel has multi-second degradation
    episodes that otherwise land 2-3x swings on the short legs (observed
    3.9k vs 9.8k sps for the identical distill8 program on the same day)."""
    import jax

    fused = jax.jit(lambda p, k: diffusion.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(key_seed)
    fused(params, key).block_until_ready()
    sec = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        out = None
        for i in range(runs):
            out = fused(params, jax.random.fold_in(key, w * runs + i))
        out.block_until_ready()
        sec = min(sec, (time.perf_counter() - t0) / runs)
    return {"sps": round(shape[0] / sec, 1), **extra}


def _structured_images(n: int, size: int, seed: int) -> np.ndarray:
    """Deterministic structured synthetic images (soft Gaussian blobs on a
    colored background): a learnable target, unlike uniform noise, so the
    quality leg's FID actually discriminates trained-vs-untrained models."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    imgs = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        bg = rng.uniform(0.0, 0.4, size=(3,)).astype(np.float32)
        img = np.broadcast_to(bg, (size, size, 3)).copy()
        for _ in range(2):
            cy, cx = rng.uniform(0.2, 0.8, size=2)
            sig = rng.uniform(0.08, 0.25)
            col = rng.uniform(0.4, 1.0, size=(3,)).astype(np.float32)
            g = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)))
            img += g[:, :, None] * col
        imgs[i] = np.clip(img, 0.0, 1.0)
    return (imgs * 255).astype(np.uint8)


def _quality_leg() -> dict:
    """Fixed-seed tiny train -> sample -> random-extractor FID + loss@300.

    Everything is seeded (data, init, training key stream, sampling key,
    extractor weights), so these numbers are comparable round-over-round:
    a quality regression anywhere in process math, U-Net parts, training
    step, or sampler moves them. The FID uses the from-scratch Flax
    InceptionV3 with SEEDED RANDOM weights (metrics/inception.py — a valid
    relative metric, NOT comparable to published FID numbers); if that
    extractor fails it falls back to weight-free pixel-moment features and
    says so in the output.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from __graft_entry__ import _flagship
    from diffusion_model_nemo_tpu.metrics.fid import FIDScorer, default_feature_fn
    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    SIZE, DIM, TT, QB = 16, 16, 100, 64
    STEPS = int(os.environ.get("DMN_BENCH_QSTEPS", "300"))  # smoke-test knob
    data = _structured_images(8 * QB, SIZE, seed=0).reshape(8, QB, SIZE, SIZE, 3)
    real = _structured_images(128, SIZE, seed=1)  # held-out "real" set

    model = _flagship(image_size=SIZE, dim=DIM, dim_mults=(1, 2), timesteps=TT)
    model.init_params(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(model.cfg.get("optim"), max_steps=STEPS, grad_clip=1.0)
    params = jax.tree.map(jnp.copy, model.params)
    ema = jax.tree.map(jnp.copy, model.ema_params)
    opt = tx.init(params)

    # the whole 300-step run is ONE lax.scan dispatch (per-step host
    # dispatches through the remote tunnel would dominate this leg)
    data_dev = jnp.asarray(data)
    labels = jnp.zeros((QB,), jnp.int32)
    base_key = jax.random.PRNGKey(42)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_scan(params, opt_state, ema_params):
        def body(carry, i):
            params, opt_state, ema_params = carry
            b = {
                "image": jax.lax.dynamic_index_in_dim(
                    data_dev, i % 8, keepdims=False
                ),
                "label": labels,
            }
            key = jax.random.fold_in(base_key, i)
            (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
                params, b, key, i
            )
            u, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, u)
            ema_params = ema_update(ema_params, params, 0.999, i)
            return (params, opt_state, ema_params), loss

        (params, opt_state, ema_params), losses = jax.lax.scan(
            body, (params, opt_state, ema_params), jnp.arange(STEPS)
        )
        return params, opt_state, ema_params, losses

    params, opt, ema, losses = train_scan(params, opt, ema)
    loss300 = float(jnp.mean(losses[-5:]))

    model.params = params
    model.ema_params = ema
    samples = np.asarray(
        model.sample(batch_size=128, image_size=SIZE, key=jax.random.PRNGKey(7))
    )  # [0, 1] floats

    extractor = "inception_random"
    try:
        from diffusion_model_nemo_tpu.metrics.inception import inception_feature_fn

        feat = inception_feature_fn(None, batch_size=64)
    except Exception:
        feat, extractor = default_feature_fn, "pixel_moments"
    scorer = FIDScorer(feature_fn=feat)
    try:
        scorer.update_real(real.astype(np.float32) / 255.0)
        scorer.update_generated(np.clip(samples, 0.0, 1.0))
        fid = round(scorer.compute(), 3)
    except Exception as e:
        if extractor == "pixel_moments":
            raise
        # inception compile failed (e.g. tunnel hiccup): pixel fallback
        extractor = f"pixel_moments (inception failed: {type(e).__name__})"
        scorer = FIDScorer(feature_fn=default_feature_fn)
        scorer.update_real(real.astype(np.float32) / 255.0)
        scorer.update_generated(np.clip(samples, 0.0, 1.0))
        fid = round(scorer.compute(), 3)
    return {
        "fid_rand": fid,
        "loss300": round(loss300, 5),
        "extractor": extractor,
        "task": f"blobs {SIZE}x{SIZE}, dim-{DIM} U-Net, T={TT}, {STEPS} steps @ B={QB}",
        "note": "seeded relative metrics for regression tracking; NOT published-FID-comparable",
    }


def main() -> None:
    # Default budget: a warm-cache full run fits well inside it, and the
    # incremental JSON printing means even a harder external kill leaves the
    # latest complete record in the tail.
    budget_s = float(os.environ.get("DMN_BENCH_BUDGET_S", "1500"))
    _install_watchdog(budget_s)
    _set("budget_s", budget_s)
    _emit()  # a parseable (null-value) line exists from t=0

    t_init = time.perf_counter()
    import jax
    import jax.numpy as jnp

    if os.environ.get("DMN_BENCH_CPU", "0") == "1":
        # smoke-testing only: sitecustomize pre-imports jax with the real TPU
        # backend, and env vars alone cannot switch it (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

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

    peak, hbm_bw, device_kind = _peak_flops(jax.devices()[0])
    jnp.ones((8, 8)).sum().block_until_ready()  # backend init probe
    _set("device_kind", device_kind)
    _set("peak_bf16_flops", peak)
    _set("hbm_bw_bytes", hbm_bw)
    _set("device_init_s", round(time.perf_counter() - t_init, 1))
    _emit()

    # ---- north star FIRST: flagship dim-32 fused scan ------------------------
    # runs=2 (x2 windows): 5 chain dispatches total. In a degraded-tunnel
    # window each dispatch+host-sync costs minutes (the r5 run-6 northstar
    # phase alone ate 18.7 min of the budget); 4 timed runs keep the
    # best-of-window protection at ~70% of the dispatch count.
    r32 = _run_leg(
        "northstar",
        lambda: _bench_model(dim=32, batch=BATCH, runs=2, peak=peak, hbm_bw=hbm_bw),
        est_s=30,
        emit=False,
    )
    if r32 and "error" not in r32:
        with _LOCK:
            _STATE.update(
                value=round(r32["sps"], 4),
                mfu_pct=round(r32["mfu_pct"], 2),
                sol_pct=round(r32["sol_pct"], 2),
                roofline_bound=r32["bound"],
                flops_per_forward=r32["flops_per_forward"],
                bytes_per_forward=r32["bytes_per_forward"],
                # the headline model, stated explicitly (VERDICT r4 #2): a
                # LIGHTER topology than the reference's unet_small.yaml
                # default [1,2,4,8] — the apples-to-apples number for the
                # reference U-Net is the ref_topo leg below.
                topology="Unet dim=32 dim_mults=[1,2,2,2]",
            )
            _STATE.pop("northstar", None)
    _emit()
    if not r32 or "error" in r32:
        # nothing else is meaningful without the flagship model; still report
        # every leg explicitly so the record is complete
        for leg in _ALL_LEGS:
            _set(leg, {"skipped": "northstar_failed"})
        _emit()
        return

    model_fn, params, shape = r32["model_fn"], r32["params_tree"], r32["shape"]

    # ---- reference-style eager loop (baseline emulation) ---------------------
    # One jitted step per t + per-step host transfer, like the reference's
    # Python loop with .cpu() each iteration. Timed over a slice of the chain
    # and scaled (the per-step cost is t-independent). If this leg fails or
    # is budget-skipped, vs_baseline stays null with the reason recorded —
    # never a fabricated constant.
    def eager_leg():
        sampler = r32["sampler"]
        key = jax.random.PRNGKey(1)
        step_jit = jax.jit(lambda p, x, t, k: sampler.p_sample(model_fn, p, x, t, k))
        x = jax.random.normal(key, shape)
        t_b = jnp.full((BATCH,), T - 1, jnp.int32)
        np.asarray(step_jit(params, x, t_b, key))  # compile
        # 12 steps give a stable per-step estimate (t-independent cost);
        # 20 cost 98 s of budget when a degraded window put the per-step
        # dispatch at ~5 s (r5 run 4: 0.20 sps baseline).
        SLICE = 12
        t0 = time.perf_counter()
        for i in range(SLICE):
            t_b = jnp.full((BATCH,), T - 1 - i, jnp.int32)
            x = step_jit(params, x, t_b, jax.random.fold_in(key, i))
            _ = np.asarray(x)  # host copy per step, like the reference
        eager_time = (time.perf_counter() - t0) / SLICE * T
        return {"sps": round(BATCH / eager_time, 4)}

    eb = _run_leg("baseline_eager", eager_leg, est_s=30, emit=False)
    if eb and "sps" in eb:
        with _LOCK:
            _STATE["vs_baseline"] = round(r32["sps"] / eb["sps"], 3)
            _STATE["baseline"] = (
                "reference-style per-step dispatch + host sync on same chip"
            )
            _STATE["baseline_value"] = eb["sps"]
            _STATE.pop("baseline_eager", None)
    else:
        _set("baseline_error", (eb or {}).get("error") or (eb or {}).get("skipped", "skipped"))
    _emit()

    full = os.environ.get("DMN_BENCH_FULL", "1") != "0"

    # ---- torch parity, driver-visible (VERDICT r4 #5) -------------------------
    # The 8-step loss-curve/parameter lockstep vs a torch replica of the
    # reference hot loop (tests/test_torch_parity_training.py), run in a CPU
    # subprocess (CPU-for-CPU numerics; the TPU backend in this process would
    # perturb f32 conv rounding) and summarized as two max-deltas.
    if full:
        def parity_leg():
            import subprocess
            import sys

            repo = os.path.dirname(os.path.abspath(__file__))
            proc = subprocess.run(
                [sys.executable, os.path.join(repo, "tools", "parity_probe.py")],
                capture_output=True, text=True, timeout=max(60.0, _remaining()),
                cwd=repo,
            )
            if proc.returncode != 0:
                return {"error": f"probe rc={proc.returncode}: "
                                 f"{(proc.stderr or proc.stdout)[-160:]}"}
            return json.loads(proc.stdout.strip().splitlines()[-1])

        _run_leg("parity", parity_leg, est_s=90)

    # ---- reference-default topology (VERDICT r4 #2) ---------------------------
    # The reference's own CIFAR config is dim 32, dim_mults [1,2,4,8]
    # (/root/reference/examples/configs/ddpm/unet_small.yaml:25,30 —
    # channels 32/64/128/256): the apples-to-apples sps/MFU for the
    # reference U-Net, next to the lighter headline topology.
    if full:
        def ref_topo_leg():
            rt = _bench_model(dim=32, batch=BATCH, runs=2, peak=peak,
                              hbm_bw=hbm_bw, dim_mults=(1, 2, 4, 8))
            return {
                "sps": round(rt["sps"], 4),
                "mfu_pct": round(rt["mfu_pct"], 2),
                "sol_pct": round(rt["sol_pct"], 2),
                "params": rt["params"],
                "topology": "Unet dim=32 dim_mults=[1,2,4,8] (reference unet_small.yaml)",
            }

        _run_leg("ref_topo", ref_topo_leg, est_s=45)

    # ---- training envelope on the flagship -----------------------------------
    if full:
        def train_leg():
            res = _bench_training(
                r32["model"], BATCH, fwd_flops=r32["flops_per_forward"], peak=peak,
                scan_steps=10, profile=True,
            )
            # surface the device budget as its own compact-line entry
            bud = res.pop("budget_us", None)
            if bud:
                _set("train_budget", {"us_per_step": bud})
            return res

        _run_leg("train", train_leg, est_s=90)

    # ---- fast-sampler legs (cheap; before the quality leg's 300-step train) --
    if full:
        from diffusion_model_nemo_tpu.modules import GeneralizedGaussianDiffusion

        _run_leg(
            "ddim50",
            lambda: _sampler_leg(
                GeneralizedGaussianDiffusion(
                    timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=50
                ),
                model_fn, params, shape, runs=5, key_seed=2,
                extra={"steps": 50, "eta": 0.0},
            ),
            est_s=20,
        )
        # the progressive-distillation student's serving configuration:
        # 8-step deterministic DDIM in the v-parameterization
        # (training/distillation.py; throughput-only — random weights
        # like every other leg)
        _run_leg(
            "distill8",
            lambda: _sampler_leg(
                GeneralizedGaussianDiffusion(
                    timesteps=T, schedule_name="cosine", eta=0.0,
                    ddim_timesteps=8, objective="pred_v",
                ),
                model_fn, params, shape, runs=10, key_seed=6,
                extra={"steps": 8, "objective": "pred_v"},
            ),
            est_s=15,
        )

    # ---- exact discrete-VLB bits/dim (VERDICT r4 #7) --------------------------
    # The reference-core evaluation capability
    # (reference abstract_diffusion_model.py:137-197) as ONE fused scan over
    # t = T-1..0 — a driver-visible perf + sanity number (seeded inputs, so
    # the value itself regresses round-over-round).
    if full:
        def bpd_leg():
            from __graft_entry__ import _flagship

            SIZE, DIM, TT, BB = 16, 16, 100, 32
            m = _flagship(image_size=SIZE, dim=DIM, dim_mults=(1, 2), timesteps=TT)
            m.init_params(jax.random.PRNGKey(0))
            x = (
                jnp.asarray(_structured_images(BB, SIZE, seed=3), jnp.float32)
                / 127.5
                - 1.0
            )  # scaled [-1, 1] space, as the trainer feeds it
            out = m.calculate_bits_per_dimension(
                x, key=jax.random.PRNGKey(9), max_batch_size=BB
            )
            out["total_bpd"].block_until_ready()  # compile + first run
            t0 = time.perf_counter()
            out = m.calculate_bits_per_dimension(
                x, key=jax.random.PRNGKey(9), max_batch_size=BB
            )
            bpd = float(jnp.mean(out["total_bpd"]))
            sec = time.perf_counter() - t0
            return {"bpd": round(bpd, 4), "batch": BB, "T": TT,
                    "images_per_sec": round(BB / sec, 1)}

        _run_leg("bpd", bpd_leg, est_s=60)

    # ---- per-category device-time budget of one sampling step (VERDICT r4 #3)
    # Where the 26.6%-MFU parity path's step time actually goes: device-trace
    # X events of one fused 1000-step chain, summed by op category, reported
    # as us/step — the measured breakdown behind the "VPU/norm/custom-call
    # time the MXU roofline doesn't credit" claim.
    if full:
        def step_budget_leg():
            from diffusion_model_nemo_tpu.utils.profiling import profile_categories

            sampler = r32["sampler"]
            fused = jax.jit(
                lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k)
            )
            key = jax.random.PRNGKey(11)
            fused(params, key).block_until_ready()  # warm
            total_ms, by_cat, _ = profile_categories(
                lambda: fused(params, jax.random.fold_in(key, 1)).block_until_ready()
            )
            if total_ms <= 0:
                return {"error": "no device events captured"}
            top = sorted(by_cat.items(), key=lambda kv: -kv[1])[:6]
            per_step = {k: round(v / T * 1e3, 1) for k, v in top}
            per_step["rest"] = round(
                (total_ms - sum(v for _, v in top)) / T * 1e3, 1
            )
            per_step["device_total"] = round(total_ms / T * 1e3, 1)
            return {"us_per_step": per_step}

        _run_leg("step_budget", step_budget_leg, est_s=60)

    # ---- batch-size attack on the parity-path MFU (VERDICT r4 #3, measured) --
    # The step budget shows the dim-32 chain dominated by VPU/custom-call
    # time; B=256 doubles the MXU work per fixed-shape op instance — if the
    # convs' MXU fill (not per-op overhead) is the limiter this moves MFU,
    # if the VPU floor scales with B it doesn't. Either way: a number.
    if full:
        def b256_leg():
            rb = _bench_model(dim=32, batch=256, runs=2, peak=peak, hbm_bw=hbm_bw)
            return {
                "sps": round(rb["sps"], 4),
                "mfu_pct": round(rb["mfu_pct"], 2),
                "sol_pct": round(rb["sol_pct"], 2),
                "batch": 256,
            }

        _run_leg("b256", b256_leg, est_s=45)

    # ---- serving-path throughput (production daemon, DDIM-50) -----------------
    # End-to-end images/sec through BatchingSampler.submit(): request queue ->
    # coalescing -> fixed-shape device batch -> on-device uint8 -> per-request
    # slices. Compare with `ddim50` above to read off the serving overhead.
    # change_sampler mutates the flagship model object — every later leg
    # (quality/dim128/tpu_s2d/dit50) builds its own model, so this runs after
    # the last r32 consumer (step_budget) but before the wall-heavy repeat
    # legs: on a degraded-tunnel day the budget then drops the r4-stable
    # repeats, not the serving number.
    if full:
        def serving_leg():
            import threading as _th

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

            threads = [_th.Thread(target=client, args=(i,)) for i in range(N_REQ)]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            stats = b.snapshot_stats()
            b.stop()
            return {
                "images_per_sec": round(N_REQ * PER / wall, 1),
                "ddim_steps": 50,
                "requests": N_REQ,
                "images_per_request": PER,
                "mean_latency_ms": stats.get("avg_request_latency_ms"),
                "batch_fill": stats.get("avg_batch_fill"),
                "errors": errors[:2],
            }

        _run_leg("serving", serving_leg, est_s=40)

    # ---- latent diffusion leg: 1000-step DDPM on f=2 VAE latents --------------
    # Same public workload (CIFAR 32x32 images out) via the LatentDiffusion
    # family: the dim-32 U-Net runs on 16x16x4 latents (4x fewer spatial
    # positions per network call) + ONE decoder pass — the architecture-level
    # route to faster sampling that keeps full-resolution decoding.
    if full:
        def latent_leg():
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
            return {"sps": round(BATCH / sec, 1), "steps": T,
                    "latent": "16x16x4", "unet_params": n_unet}

        _run_leg("latent1000", latent_leg, est_s=30)

    # ---- higher-order ODE solvers ---------------------------------------------
    if full:
        from diffusion_model_nemo_tpu.modules import (
            DPMSolverDiffusion,
            KarrasDiffusion,
        )

        _run_leg(
            "dpm20",
            lambda: _sampler_leg(
                DPMSolverDiffusion(
                    timesteps=T, schedule_name="cosine", solver_steps=20, solver_order=2
                ),
                model_fn, params, shape, runs=5, key_seed=4,
                extra={"steps": 20, "order": 2},
            ),
            est_s=15,
        )
        _run_leg(
            "edm18",
            lambda: _sampler_leg(
                KarrasDiffusion(
                    timesteps=T, schedule_name="cosine", solver_steps=18, solver_order=2
                ),
                model_fn, params, shape, runs=5, key_seed=5,
                extra={"steps": 18, "order": 2, "nfe": 35},
            ),
            est_s=15,
        )

    # ---- score-SDE predictor-corrector ----------------------------------------
    if full:
        def pc_leg():
            from diffusion_model_nemo_tpu.modules.sde_lib import VPSDE
            from diffusion_model_nemo_tpu.modules.sde_samplers import (
                PredictorCorrectorSampler,
            )

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
            return {"sps": round(BATCH / sec, 2), "nfe": 1000 * 2,
                    "predictor": "reverse_diffusion", "corrector": "langevin"}

        _run_leg("pc_sde", pc_leg, est_s=25)

    # ---- quality leg (seeded tiny train + random-extractor FID) --------------
    if full:
        _run_leg("quality", _quality_leg, est_s=90)

    # ---- realistic model size: dim-128 ---------------------------------------
    if full:
        def dim128_leg():
            r128 = _bench_model(dim=128, batch=BATCH, runs=1, peak=peak, hbm_bw=hbm_bw)
            out = {
                "sps": round(r128["sps"], 4),
                "mfu_pct": round(r128["mfu_pct"], 2),
                "sol_pct": round(r128["sol_pct"], 2),
                "params": r128["params"],
            }
            if _remaining() > 60:
                try:  # training MFU at realistic model scale
                    out["train"] = _bench_training(
                        r128["model"], BATCH, steps=20, windows=2,
                        fwd_flops=r128["flops_per_forward"], peak=peak,
                    )
                except Exception as e:
                    out["train"] = {"error": f"{type(e).__name__}: {e}"[:200]}
            return out

        _run_leg("dim128", dim128_leg, est_s=60)

    # ---- opt-in TPU-geometry fast path (tpu_geometry: s2d) -------------------
    # Same public workload (CIFAR 32x32 in/out, 1000-step DDPM) on the
    # space-to-depth variant: every U-Net level at half spatial resolution.
    # A different architecture trained with the flag on (modules/unet.py) —
    # reported separately; the parity model stays the headline.
    if full:
        def s2d_leg():
            rs2d = _bench_model(dim=32, batch=BATCH, runs=3, peak=peak,
                                hbm_bw=hbm_bw, tpu_geometry="s2d")
            out = {
                "sps": round(rs2d["sps"], 4),
                "mfu_pct": round(rs2d["mfu_pct"], 2),
                "sol_pct": round(rs2d["sol_pct"], 2),
                "params": rs2d["params"],
                "tpu_geometry": "s2d",
            }
            if _remaining() > 45:
                try:  # s2d training envelope (same full update as `train`)
                    out["train"] = _bench_training(
                        rs2d["model"], BATCH, windows=2,
                        fwd_flops=rs2d["flops_per_forward"], peak=peak,
                    )
                except Exception as e:
                    out["train"] = {"error": f"{type(e).__name__}: {e}"[:200]}
            return out

        _run_leg("tpu_s2d", s2d_leg, est_s=45)

    # ---- DiT-S/2 transformer backbone at DDIM-50 ------------------------------
    # The MXU-shaped network (pure [B, N, D] matmuls, modules/dit.py) —
    # driver-visible so the transformer path's throughput/MFU regressions
    # show up.
    if full:
        def dit_leg():
            from diffusion_model_nemo_tpu.modules import (
                DiT,
                GeneralizedGaussianDiffusion,
            )

            net = DiT(dim=384, depth=12, heads=6, patch_size=2, channels=3,
                      dtype="bfloat16")
            dshape = (BATCH, IMG, IMG, 3)
            xz = jnp.zeros(dshape, jnp.float32)
            tz = jnp.zeros((BATCH,), jnp.float32)
            dparams = net.init(jax.random.PRNGKey(8), xz, tz)["params"]

            def dit_fn(p, x, t):
                return net.apply({"params": p}, x, t)

            dd = GeneralizedGaussianDiffusion(
                timesteps=T, schedule_name="cosine", eta=0.0, ddim_timesteps=50
            )
            res = _sampler_leg(dd, dit_fn, dparams, dshape, runs=2, key_seed=9,
                               extra={"steps": 50, "geometry": "DiT-S/2"}, windows=2)
            fwd, _ = _forward_costs(dit_fn, dparams, dshape)
            sec = dshape[0] / res["sps"]
            res["mfu_pct"] = round(100.0 * fwd * 50 / (sec * peak), 2)
            res["params"] = sum(int(p.size) for p in jax.tree.leaves(dparams))
            return res

        _run_leg("dit50", dit_leg, est_s=40)

    _set("wall_s_total", round(time.monotonic() - (_DEADLINE[0] - budget_s), 1))
    _emit()


if __name__ == "__main__":
    main()
