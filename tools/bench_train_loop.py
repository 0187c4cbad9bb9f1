"""Sustained Trainer-loop throughput A/B: steps_per_execution amortization.

Measures the PRODUCTION training loop (Trainer.fit with the synthetic
dataset, threaded prefetch, logging cadence — not a bare jitted update fn)
at steps_per_execution in {1, K}. On remote-TPU rigs each dispatch pays a
tunnel round-trip; once the device step is fast (tpu_geometry=s2d: ~2 ms)
dispatch latency dominates, and scanning K optimizer steps per dispatch
(trainer.py:_build_multi_update_fn) recovers it.

Throughput is read from the Trainer's own windowed samples_per_sec metric
(median of steady-state windows; the first two windows absorb compile), so
compile/trace time does not skew the comparison.

Usage: python tools/bench_train_loop.py [--geometry s2d] [--spe 8]
       [--steps 400] [--batch 128] [--dim 32]
"""
import argparse
import os
import statistics
import sys

os.environ.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_xla_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from __graft_entry__ import _flagship


def run(geometry: str, spe: int, steps: int, batch: int, dim: int,
        window: int = 40) -> float:
    from diffusion_model_nemo_tpu.config import from_dict
    from diffusion_model_nemo_tpu.training import Trainer

    model = _flagship(image_size=32, dim=dim, dim_mults=(1, 2, 2, 2),
                      timesteps=1000, tpu_geometry=geometry)
    model.cfg["train_ds"] = from_dict({
        "name": "synthetic",
        "image_size": 32,
        "channels": 3,
        "length": batch * 64,
        "batch_size": batch,
        "shuffle": False,
    })
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=1, max_steps=steps, log_every_n_steps=window,
                      steps_per_execution=spe)
    windows = []
    orig = trainer._log_metrics

    def capture(metrics, step):
        if "samples_per_sec" in metrics:
            windows.append(metrics["samples_per_sec"])
        orig(metrics, step)

    trainer._log_metrics = capture
    trainer.fit(model)
    steady = windows[2:] or windows  # first windows absorb compile
    sps = statistics.median(steady)
    print(f"geometry={geometry} spe={spe}: median steady-state "
          f"{sps:.1f} samples/sec over {len(steady)} windows "
          f"({batch / sps * 1e3:.2f} ms/step)", flush=True)
    return sps


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="s2d")
    ap.add_argument("--spe", type=int, default=8)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dim", type=int, default=32)
    a = ap.parse_args()
    base = run(a.geometry, 1, a.steps, a.batch, a.dim)
    multi = run(a.geometry, a.spe, a.steps, a.batch, a.dim)
    print(f"speedup: {multi / base:.2f}x", flush=True)
