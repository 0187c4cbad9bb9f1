"""Dump the optimized HLO of the fused sampling scan and list copy/fusion ops
with shapes — identifies what the profiler's anonymous copy.NNN ops move.

Usage: python tools/dump_hlo_copies.py [dim] [batch] [out.hlo]
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sampler.hlo"

    import jax

    from __graft_entry__ import _flagship

    model = _flagship(image_size=32, dim=dim, dim_mults=(1, 2, 2, 2), timesteps=1000)
    model.init_params(jax.random.PRNGKey(0))
    params, net, sampler = model.params, model.diffusion_model, model.sampler

    def model_fn(p, x, t):
        return net.apply({"params": p}, x, t)

    shape = (batch, 32, 32, 3)
    fused = jax.jit(lambda p, k: sampler.p_sample_loop(model_fn, p, shape, k))
    hlo = fused.lower(params, jax.random.PRNGKey(0)).compile().as_text()
    Path(out_path).write_text(hlo)
    print(f"wrote {len(hlo)} chars to {out_path}")

    def size_of(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        bytes_per = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "u8": 1, "f16": 2}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * bytes_per

    copies = []
    for line in hlo.splitlines():
        m = re.search(r"%?(copy[.\d]*) = (\S+)\{?", line.strip())
        if m and "= " in line and " copy(" in line:
            shape_m = re.search(r"= (\S+?)(\{[^}]*\})? copy\(", line)
            if shape_m:
                copies.append((size_of(shape_m.group(1)), shape_m.group(1), line.strip()[:160]))
    copies.sort(reverse=True)
    print("\n-- largest copies in optimized HLO --")
    for size, shp, line in copies[:20]:
        print(f"{size/1e6:9.2f} MB  {shp:28s} {line[:120]}")


if __name__ == "__main__":
    main()
