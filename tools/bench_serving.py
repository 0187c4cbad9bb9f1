"""Serving-path throughput: concurrent requests through the batching daemon.

Measures end-to-end images/sec through BatchingSampler.submit() (request
queue → coalescing → fixed-shape device batch → per-request slices) with the
DDIM fast sampler — the production serving configuration. Compare against
bench.py's raw `ddim50` device number to see the serving overhead.

Usage: python tools/bench_serving.py [max_batch] [ddim_steps] [n_requests] [images_per_request] [guidance_scale]

A non-empty ``guidance_scale`` switches to a class-conditional flagship and
submits every request with that CFG weight (one 2B-batched network call per
step — expect ~half the unconditional device envelope).
"""

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    max_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ddim_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_requests = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    per_request = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    guidance = float(sys.argv[5]) if len(sys.argv) > 5 and sys.argv[5] else None

    import jax

    from __graft_entry__ import _flagship
    from diffusion_model_nemo_tpu.serving import BatchingSampler

    model = _flagship(
        image_size=32, dim=32, dim_mults=(1, 2, 2, 2), timesteps=1000,
        num_classes=10 if guidance is not None else None,
    )
    model.init_params(jax.random.PRNGKey(0))
    model.change_sampler(
        {
            "_target_": "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
            "timesteps": 1000,
            "schedule_name": "cosine",
            "eta": 0.0,
            "ddim_timesteps": ddim_steps,
        }
    )

    b = BatchingSampler(model, image_size=32, max_batch=max_batch,
                        linger_ms=5.0, use_ema=False)
    t0 = time.perf_counter()
    b.start(warmup=True)  # includes the sampler compile
    warmup_s = time.perf_counter() - t0

    # Fire all requests from concurrent client threads.
    errors = []

    def client(i):
        try:
            kw = {}
            if guidance is not None:
                kw = {"label": i % 10, "guidance_scale": guidance}
            out = b.submit(per_request, timeout=1200, **kw)
            assert out.shape[0] == per_request
        except Exception as e:
            errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_requests)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = b.snapshot_stats()
    b.stop()

    total_images = n_requests * per_request
    print(json.dumps({
        "served_sps": round(total_images / wall, 1),
        "total_images": total_images,
        "wall_s": round(wall, 3),
        "warmup_s": round(warmup_s, 1),
        "errors": errors[:3],
        "stats": stats,
        "max_batch": max_batch,
        "ddim_steps": ddim_steps,
        "guidance_scale": guidance,
    }))


if __name__ == "__main__":
    main()
