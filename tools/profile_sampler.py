"""Profile the fused DDPM sampling scan on the TPU and summarize device time.

Captures a jax.profiler trace of one full sampling chain, then parses the
trace.json.gz: sums 'X' (complete) events on the TPU device track, grouped
by op category, and prints the top ops — the round-1 recipe that found the
gather and Pallas-layout costs.

Usage: python tools/profile_sampler.py [dim] [batch] [timesteps]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffusion_model_nemo_tpu.utils.profiling import (  # noqa: E402
    parse_trace_categories as parse_trace,
)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    import jax

    from __graft_entry__ import _flagship

    import os

    geom = os.environ.get("DMN_PROFILE_GEOMETRY", "off")
    model = _flagship(image_size=32, dim=dim, dim_mults=(1, 2, 2, 2), timesteps=T,
                      tpu_geometry=geom)
    model.init_params(jax.random.PRNGKey(0))
    params, net, sampler = model.params, model.diffusion_model, model.sampler

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    shape = (batch, 32, 32, 3)
    fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
    key = jax.random.PRNGKey(1)
    compiled = fused.lower(params, key).compile()
    compiled(params, key).block_until_ready()  # warm

    hlo_out = os.environ.get("DMN_PROFILE_HLO_OUT")
    if hlo_out:  # optimized HLO: map profiled fusion names → source ops
        Path(hlo_out).write_text(compiled.as_text())
        print(f"optimized HLO → {hlo_out}")

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        compiled(params, jax.random.fold_in(key, 1)).block_until_ready()
        jax.profiler.stop_trace()
        total, by_cat, by_name = parse_trace(Path(d))

    print(f"\n== dim={dim} B={batch} T={T}: device total {total:.1f} ms "
          f"({total / T:.3f} ms/step, {batch / (total / 1e3):.1f} sps-device) ==")
    print("\n-- by category (ms, ms/step) --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{k:20s} {v:10.1f} {v / T:8.4f}")
    print("\n-- top 80 ops --")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:80]:
        print(f"{v:10.1f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
