"""Measure DMN_SAMPLE_SCAN_UNROLL on the 1000-step DDPM chain (real chip).

Unrolling the reverse-chain scan is numerically identical (verified bitwise,
tests/test_scan_unroll.py) but lets XLA software-pipeline one step's
elementwise tail into the next step's network head. This sweeps unroll
factors in fresh subprocesses (the knob is read at trace time).

Usage: python tools/microbench_unroll.py [dim] [batch] [runs] [unrolls,...]
Prints one JSON line per factor plus a summary.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import jax
from __graft_entry__ import _flagship

dim, batch, runs, geometry = {dim}, {batch}, {runs}, {geometry!r}
model = _flagship(image_size=32, dim=dim, dim_mults=(1, 2, 2, 2),
                  timesteps=1000, tpu_geometry=geometry)
model.init_params(jax.random.PRNGKey(0))
net, sampler, params = model.diffusion_model, model.sampler, model.params
shape = (batch, 32, 32, 3)
fn = jax.jit(lambda p, k: sampler.p_sample_loop(
    lambda pp, x, t: net.apply({{"params": pp}}, x, t), p, shape, k))
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
fn(params, key).block_until_ready()
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
out = None
for i in range(runs):
    out = fn(params, jax.random.fold_in(key, i))
out.block_until_ready()
sec = (time.perf_counter() - t0) / runs
print(json.dumps({{"sps": round(batch / sec, 2), "sec_per_chain": round(sec, 4),
                   "compile_s": round(compile_s, 1)}}))
"""


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    unrolls = [int(u) for u in (sys.argv[4].split(",") if len(sys.argv) > 4 else [1, 2, 4])]
    geometry = os.environ.get("DMN_GEOMETRY", "off")

    results = {}
    for u in unrolls:
        env = dict(os.environ, DMN_SAMPLE_SCAN_UNROLL=str(u))
        env.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_xla_cache")
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=str(REPO), dim=dim, batch=batch,
                                                 runs=runs, geometry=geometry)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[u] = json.loads(line)
        except json.JSONDecodeError:
            results[u] = {"error": (proc.stderr or proc.stdout)[-400:]}
        print(f"unroll={u}: {results[u]}", flush=True)

    print(json.dumps({"dim": dim, "batch": batch, "geometry": geometry,
                      "unroll": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
