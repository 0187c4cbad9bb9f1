"""LoRA-fine-tune a trained archive on a new dataset (Hu et al. 2021).
Beyond the reference's example surface — the reference only supports full
fine-tuning; this trains low-rank adapters with the base frozen, ships them
as a tiny .npz, and can bake them into a normal archive for zero-overhead
serving.

Usage:
    python finetune_lora.py model_path=DDPM.dmn output_path=DDPM_lora.dmn \
        rank=8 steps=2000 dataset_name=file file_dir=/data/new_domain

Works for any family whose training_step is pure (DDPM/conditional/EDM/
flow/SR3/...). adapters_path= additionally saves the raw adapters;
merge=false skips writing the merged archive.
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from common import hydra_runner

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.training.lora import LoRAFinetuner
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class LoraConfig:
    model_path: str = "DDPM.dmn"
    output_path: str = "DDPM_lora.dmn"  # merged archive (merge=true)
    adapters_path: Optional[str] = None  # also save raw adapters (.npz)
    merge: bool = True
    use_ema: bool = True

    # adapters
    rank: int = 8
    alpha: Optional[float] = None  # defaults to rank (scale 1)
    targets: str = ".*"  # regex over '/'-joined kernel paths (e.g. "attn")

    # optimizer
    steps: int = 2000
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 1.0

    # data (defaults to the base model's train_ds; synthetic needs no network)
    dataset_name: Optional[str] = None
    batch_size: int = 64
    dataset_length: int = 4096  # synthetic only
    file_dir: Optional[str] = None  # for dataset_name=file

    seed: int = 0
    log_every: int = 50
    devices: int = 1  # chips (-1 = all); >1 shards batches over a data mesh


@hydra_runner(schema=LoraConfig)
def main(cfg):
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    logging.info(
        f"LoRA fine-tuning {type(model).__name__} (rank={cfg.rank}, "
        f"targets={cfg.targets!r}) for {cfg.steps} steps"
    )

    ds_cfg = dict(model.cfg.get("train_ds") or {})
    if cfg.dataset_name:
        ds_cfg["name"] = cfg.dataset_name
    ds_cfg.setdefault("name", "synthetic")
    ds_cfg["batch_size"] = cfg.batch_size
    if str(ds_cfg["name"]).startswith("synthetic"):
        ds_cfg.setdefault("length", cfg.dataset_length)
    if cfg.file_dir:
        ds_cfg["data_dir"] = cfg.file_dir
    model.setup_training_data(ds_cfg)
    loader = model._train_dl
    if loader is None:
        raise ValueError(f"could not build a dataloader from {ds_cfg}")

    def batches():
        while True:
            for b in loader:
                yield b

    mesh = None
    if int(cfg.devices) not in (0, 1):
        from diffusion_model_nemo_tpu.parallel.sharding import make_strategy_mesh

        all_dev = jax.devices()
        n = len(all_dev) if int(cfg.devices) == -1 else min(int(cfg.devices), len(all_dev))
        if n > 1:
            mesh = make_strategy_mesh(all_dev[:n], "ddp")

    tuner = LoRAFinetuner(
        model,
        rank=cfg.rank,
        alpha=cfg.alpha,
        targets=cfg.targets,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip,
        mesh=mesh,
        key=jax.random.PRNGKey(cfg.seed + 1),
    )
    losses = tuner.finetune(
        batches(), steps=cfg.steps, key=jax.random.PRNGKey(cfg.seed),
        log_every=cfg.log_every,
    )
    if losses:
        logging.info(f"LoRA loss: first {losses[0]:.5f} -> last {losses[-1]:.5f}")

    if cfg.adapters_path:
        logging.info(f"Adapters saved to : {tuner.save_adapters(cfg.adapters_path)}")
    if cfg.merge:
        merged = tuner.merged_model()
        logging.info(f"Merged archive saved to : {merged.save_to(cfg.output_path)}")


if __name__ == "__main__":
    main()
