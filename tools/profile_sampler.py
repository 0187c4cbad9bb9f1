"""Profile the fused DDPM sampling scan on the TPU and summarize device time.

Captures a jax.profiler trace of one full sampling chain, then parses the
trace.json.gz: sums 'X' (complete) events on the TPU device track, grouped
by op category, and prints the top ops — the round-1 recipe that found the
gather and Pallas-layout costs.

Usage: python tools/profile_sampler.py [dim] [batch] [timesteps]
"""

import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def categorize(name: str) -> str:
    n = name.lower()
    # "convolution" before generic substrings: "convert_reduce_fusion" must
    # land in reduce, not conv (a round-3 misattribution that inflated the
    # conv category with GroupNorm stat reductions).
    if "convolution" in n:
        return "conv"
    if "attn" in n or "custom-call" in n:
        return "custom-call"
    for key in ("reduce", "copy", "transpose", "rng", "threefry", "dot",
                "dynamic-slice", "dynamic_update", "scatter", "gather",
                "all-reduce", "bitcast", "broadcast", "iota", "fusion"):
        if key in n:
            return key
    return "other"


def parse_trace(trace_dir: Path):
    files = list(trace_dir.rglob("*.trace.json.gz"))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # Find TPU device pids
    tpu_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "pjrt" not in str(e.get("args", {}).get("name", "")).lower()
    }
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = e.get("dur", 0) / 1e3  # us → ms
            by_name[e["name"]] += dur
            by_cat[categorize(e["name"])] += dur
            total += dur
    return total, by_cat, by_name


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
