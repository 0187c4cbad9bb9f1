"""Reconstruct a post-hoc EMA profile from training snapshots into a .dmn.

Training with ``trainer.posthoc_ema_sigma_rels=[0.05,0.10]`` writes
power-function EMA snapshots to ``<exp_dir>/phema``; this tool synthesizes
the EMA for ANY relative width after the fact (Karras et al. 2024) and writes
a stock archive whose EMA weights are the reconstruction — every eval/serve
surface consumes it unchanged.

    python tools/reconstruct_ema.py \
        --archive  /path/to/DDPM.dmn \
        --snapshots /path/to/phema \
        --sigma_rel 0.08 \
        --output   /path/to/DDPM_sr008.dmn \
        [--t N]          # target profile time (default: latest snapshot)
        [--gamma G]      # raw profile exponent instead of --sigma_rel
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Pure host work (load snapshots -> linear solve -> weighted sum -> archive);
# never touch the TPU. DMN_TPU_PLATFORM overrides, matching the other tools.
import jax  # noqa: E402  (sitecustomize may have pre-imported with axon)

jax.config.update("jax_platforms", os.environ.get("DMN_TPU_PLATFORM", "cpu"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--archive", required=True, help="base .dmn archive")
    ap.add_argument("--snapshots", required=True, help="phema snapshot directory")
    ap.add_argument("--sigma_rel", type=float, default=None)
    ap.add_argument("--gamma", type=float, default=None)
    ap.add_argument("--t", type=int, default=None, help="target profile time")
    ap.add_argument("--output", required=True, help="output .dmn path")
    args = ap.parse_args()

    import jax as _jax

    from diffusion_model_nemo_tpu.training.checkpoints import (
        load_archive,
        load_aux_weights,
        save_archive,
    )
    from diffusion_model_nemo_tpu.training.posthoc_ema import list_snapshots, reconstruct

    cfg, params, _old_ema, extra = load_archive(args.archive)
    aux = load_aux_weights(args.archive)

    snaps = list_snapshots(args.snapshots)
    print(f"{len(snaps)} snapshots in {args.snapshots} "
          f"(t = {snaps[0][1]}..{snaps[-1][1]})" if snaps else "no snapshots found")
    ema = reconstruct(args.snapshots, sigma_rel=args.sigma_rel, gamma=args.gamma, t=args.t)

    # The reconstruction must be the same pytree as the trained weights.
    ps = _jax.tree.structure(params)
    es = _jax.tree.structure(ema)
    if ps != es:
        raise ValueError(
            f"snapshot tree does not match the archive's parameter tree:\n{ps}\nvs\n{es}"
        )

    save_archive(args.output, cfg, params, ema_params=ema, extra=extra,
                 aux_weights=aux or None)
    print(f"Wrote {args.output} (EMA = post-hoc reconstruction, "
          f"sigma_rel={args.sigma_rel} gamma={args.gamma} t={args.t or 'latest'})")


if __name__ == "__main__":
    main()
