"""Export a .dmn archive's weights as a reference-layout torch state_dict.

The migration path back OUT of this framework (inverse of
tools/import_torch_checkpoint.py): weights trained here load into the
reference's torch ``Unet``/``WaveGradUNet`` via ``load_state_dict``
(reference modules/unet.py:41-121).

    python tools/export_torch_checkpoint.py \
        --archive /path/to/DDPM.dmn \
        --output  /path/to/state_dict.pt \
        [--ema]                      # export the EMA weights instead
        [--prefix diffusion_model.]  # key prefix (NeMo/PTL attribute namespace)
        [--format pt|npz]            # default pt (torch.save); npz needs no torch

WaveGrad note: the reference WaveGradUNet constructs up-path FiLM modules its
forward never calls; this framework never created them, so load WaveGrad
exports with ``strict=False`` (the missing keys are exactly the dead modules).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Export is pure host work (restore params -> transpose -> save); never touch
# the TPU. DMN_TPU_PLATFORM overrides, matching examples/common.py.
import jax  # noqa: E402  (sitecustomize may have pre-imported with axon)

jax.config.update("jax_platforms", os.environ.get("DMN_TPU_PLATFORM", "cpu"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--archive", required=True, help=".dmn archive to export")
    ap.add_argument("--output", required=True, help="output .pt (or .npz) path")
    ap.add_argument("--ema", action="store_true", help="export EMA weights")
    ap.add_argument("--prefix", default="", help="prepended to every key")
    ap.add_argument("--format", default="pt", choices=("pt", "npz"))
    args = ap.parse_args()

    from diffusion_model_nemo_tpu.models import restore_model_from_archive
    from diffusion_model_nemo_tpu.utils import logging
    from diffusion_model_nemo_tpu.utils.torch_import import export_unet_state_dict

    model = restore_model_from_archive(args.archive, use_ema=False)
    dm = model.cfg.get("diffusion_model", {})
    params = model.ema_params if args.ema else model.params
    state = export_unet_state_dict(
        params,
        use_convnext=bool(dm.get("use_convnext", True)),
        resnet_block_order=str(dm.get("resnet_block_order", "bn_act_conv")),
        prefix=args.prefix,
    )

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    if args.format == "npz":
        import numpy as np

        np.savez(out, **state)
    else:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in state.items()}, out)
    n = sum(int(v.size) for v in state.values())
    logging.info(
        f"exported {n:,} parameters ({len(state)} tensors, "
        f"{'EMA' if args.ema else 'train'} weights) -> {out}"
    )


if __name__ == "__main__":
    main()
