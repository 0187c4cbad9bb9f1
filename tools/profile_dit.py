"""Profile the DiT sampling chain on the TPU and summarize device time.

Same recipe as tools/profile_sampler.py (trace one chain, sum device events
by category) pointed at the DiT backbone — used to attribute the gap between
measured MFU and the matmul roofline.

Usage: python tools/profile_dit.py [dim] [depth] [batch] [ddim_steps]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_xla_cache")

from profile_sampler import parse_trace  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    import jax

    from diffusion_model_nemo_tpu.config import from_dict
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.modules import GeneralizedGaussianDiffusion
    from diffusion_model_nemo_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    model = DDPM(
        cfg=from_dict(
            {
                "image_size": 32,
                "timesteps": 1000,
                "channels": 3,
                "save_every": 0,
                "diffusion_model": {
                    "_target_": "diffusion_model_nemo.modules.DiT",
                    "dim": dim,
                    "depth": depth,
                    "heads": dim // 64,
                    "patch_size": 2,
                    "channels": 3,
                    "dtype": "bfloat16",
                },
                "sampler": {
                    "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                    "timesteps": 1000,
                    "schedule_name": "cosine",
                },
                "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
                "optim": {"name": "adamw", "lr": 2e-4},
            }
        )
    )
    model.init_params(jax.random.PRNGKey(0))
    params, net = model.params, model.diffusion_model

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    ddim = GeneralizedGaussianDiffusion(
        timesteps=1000, schedule_name="cosine", eta=0.0, ddim_timesteps=steps
    )
    shape = (batch, 32, 32, 3)
    fused = jax.jit(lambda p, k: ddim.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(1)
    compiled = fused.lower(params, key).compile()
    compiled(params, key).block_until_ready()  # warm

    hlo_out = os.environ.get("DMN_PROFILE_HLO_OUT")
    if hlo_out:
        Path(hlo_out).write_text(compiled.as_text())
        print(f"optimized HLO → {hlo_out}")

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        compiled(params, jax.random.fold_in(key, 1)).block_until_ready()
        jax.profiler.stop_trace()
        total, by_cat, by_name = parse_trace(Path(d))

    print(f"\n== DiT dim={dim} depth={depth} B={batch} ddim{steps}: device total "
          f"{total:.1f} ms ({total / steps:.3f} ms/step, {batch / (total / 1e3):.1f} sps-device) ==")
    print("\n-- by category (ms, ms/step) --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{k:20s} {v:10.1f} {v / steps:8.4f}")
    print("\n-- top 60 ops --")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{v:10.1f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
