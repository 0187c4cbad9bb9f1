"""Convert a reference (PyTorch/NeMo) checkpoint into a .dmn archive.

Migration entry point for users of ``titu1994/diffusion_model_nemo``:

    python tools/import_torch_checkpoint.py \
        --checkpoint /path/to/DDPM.nemo            # or .ckpt / .pt state_dict
        --output     /path/to/DDPM.dmn \
        [--config model_config.yaml]               # required for bare state_dicts
        [--model-class DDPM]                       # default: auto from config target

Accepted checkpoint formats:
  - ``.nemo`` archive (tar with model_config.yaml + model_weights.ckpt —
    what the reference's ``save_to`` writes)
  - PyTorch-Lightning ``.ckpt`` (state_dict under the "state_dict" key)
  - bare ``state_dict`` saved with ``torch.save``

The weight mapping lives in diffusion_model_nemo_tpu/utils/torch_import.py
and fails loudly on any missing/mismatched key.
"""

from __future__ import annotations

import argparse
import sys
import tarfile
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


_REFERENCE_CLASS_MAP = {
    # reference target strings -> our model classes (models/__init__.py)
    "ddpm.DDPM": "DDPM",
    "improved_ddpm.ImprovedDDPM": "ImprovedDDPM",
    "conditional_ddpm.ConditionalDDPM": "ConditionalDDPM",
    "score_sde.ScoreSDE": "ScoreSDE",
    "wavegrad_ddpm.WavegradDDPM": "WavegradDDPM",
}


def _load_checkpoint(path: Path):
    """Returns (state_dict, cfg_dict_or_None)."""
    import torch

    if path.suffix == ".nemo" or tarfile.is_tarfile(path):
        with tarfile.open(path) as tar, tempfile.TemporaryDirectory() as td:
            names = tar.getnames()
            cfg_name = next((n for n in names if n.endswith("model_config.yaml")), None)
            w_name = next(
                (n for n in names if n.endswith(("model_weights.ckpt", "model_weights.pt"))),
                None,
            )
            if w_name is None:
                raise ValueError(f"{path}: no model_weights.ckpt inside the archive")
            tar.extract(w_name, td, filter="data")
            state = torch.load(Path(td) / w_name, map_location="cpu", weights_only=True)
            cfg = None
            if cfg_name:
                tar.extract(cfg_name, td, filter="data")
                from diffusion_model_nemo_tpu.config import load_config

                cfg = load_config(str(Path(td) / cfg_name))
            return state, cfg
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return state, None


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", default=None, help="model_config.yaml for bare state_dicts")
    ap.add_argument("--model-class", default=None, help="DDPM|ImprovedDDPM|ConditionalDDPM|ScoreSDE|WavegradDDPM")
    args = ap.parse_args()

    import os

    import jax

    # Conversion is pure host work (init template -> transpose -> archive);
    # never touch the TPU. DMN_TPU_PLATFORM overrides (examples/common.py).
    jax.config.update("jax_platforms", os.environ.get("DMN_TPU_PLATFORM", "cpu"))

    from diffusion_model_nemo_tpu import models as model_pkg
    from diffusion_model_nemo_tpu.config import from_dict, load_config
    from diffusion_model_nemo_tpu.utils import logging
    from diffusion_model_nemo_tpu.utils.torch_import import (
        convert_unet_state_dict,
        strip_prefix,
    )

    state, cfg = _load_checkpoint(Path(args.checkpoint))
    if args.config:
        cfg = load_config(args.config)
    if cfg is None:
        raise SystemExit("--config is required when the checkpoint has no embedded model_config.yaml")
    cfg = from_dict(dict(cfg))

    cls_name = args.model_class
    if cls_name is None:
        target = str(cfg.get("target", ""))
        cls_name = next(
            (v for k, v in _REFERENCE_CLASS_MAP.items() if k in target), "DDPM"
        )
        logging.info(f"model class: {cls_name} (from config target {target!r})")
    cls = getattr(model_pkg, cls_name)

    model = cls(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    dm = cfg.get("diffusion_model", {})
    is_wavegrad = "WaveGradUNet" in str(dm.get("_target_", ""))
    params = convert_unet_state_dict(
        strip_prefix({k: v for k, v in state.items()}),
        model.params,
        use_convnext=bool(dm.get("use_convnext", True)),
        resnet_block_order=str(dm.get("resnet_block_order", "bn_act_conv")),
        drop_dead_films=is_wavegrad,
    )
    import jax.numpy as jnp

    model.params = jax.tree.map(jnp.asarray, params)
    # The reference keeps no EMA; seed ours with the imported weights.
    model.ema_params = jax.tree.map(jnp.copy, model.params)
    out = model.save_to(args.output)
    n = sum(int(p.size) for p in jax.tree.leaves(model.params))
    logging.info(f"imported {n:,} parameters -> {out}")


if __name__ == "__main__":
    main()
