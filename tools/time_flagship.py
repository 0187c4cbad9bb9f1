"""Quick flagship timing: dim-32 1000-step DDPM sampling sps on the chip.

Usage: python tools/time_flagship.py [dim] [batch] [runs] [tpu_geometry]
Prints one line: sps + ms/step. Uses the persistent compile cache.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_xla_cache")


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    geometry = sys.argv[4] if len(sys.argv) > 4 else "off"

    import jax

    from diffusion_model_nemo_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()

    from __graft_entry__ import _flagship

    T = 1000
    IMG = 32
    model = _flagship(image_size=IMG, dim=dim, dim_mults=(1, 2, 2, 2), timesteps=T,
                      tpu_geometry=geometry)
    model.init_params(jax.random.PRNGKey(0))
    params = model.params
    net = model.diffusion_model
    sampler = model.sampler

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    shape = (batch, IMG, IMG, 3)
    fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    fused(params, key).block_until_ready()
    print(f"compile+first chain: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = None
    for i in range(runs):
        out = fused(params, jax.random.fold_in(key, i))
    out.block_until_ready()
    sec = (time.perf_counter() - t0) / runs
    print(f"dim={dim} B={batch} T={T} geometry={geometry}: "
          f"{batch / sec:.1f} sps  {sec * 1e3 / T:.3f} ms/step  ({sec:.3f} s/chain)")


if __name__ == "__main__":
    main()
