"""Consistency-distill a trained DDPM archive into a 1-to-few-step student
(Song et al. 2023). Beyond the reference's example surface — complements
progressive distillation (distill_ddpm.py): one training run teaches the full
ODE-jump-to-data map, so the student samples in a single network call.

Usage:
    python consistency_ddpm.py model_path=DDPM.dmn output_path=DDPM_cd.dmn \
        steps=4000 grid_steps=18 sample_steps=1 \
        dataset_name=synthetic batch_size=64
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from common import hydra_runner

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.training.consistency import ConsistencyDistiller
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class ConsistencyConfig:
    model_path: str = "DDPM.dmn"
    output_path: str = "DDPM_consistency.dmn"
    use_ema: bool = True

    # distillation
    steps: int = 4000
    grid_steps: int = 18          # N discretization levels (Karras rho-grid)
    rho: float = 7.0
    sigma_min: Optional[float] = None   # default: the schedule's own endpoints
    sigma_max: Optional[float] = None
    sigma_data: float = 0.5
    ema_decay: float = 0.95       # target-network mu
    loss: str = "l2"              # l2 | pseudo_huber
    teacher_order: int = 2        # Heun (paper) | 1 = Euler
    mode: str = "distill"         # distill (CD) | train (CT, no teacher evals)

    # packaged student
    sample_steps: int = 1         # NFE of the packaged sampler

    # optimizer
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 1.0

    # data (defaults to the teacher's train_ds; synthetic needs no network)
    dataset_name: Optional[str] = None
    batch_size: int = 64
    dataset_length: int = 4096  # synthetic only
    file_dir: Optional[str] = None  # for dataset_name=file

    seed: int = 0
    log_every: int = 50
    devices: int = 1  # chips to distill on (-1 = all); >1 shards batches over a data mesh


@hydra_runner(schema=ConsistencyConfig)
def main(cfg):
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    logging.info(
        f"Consistency-distilling {type(model).__name__} (T={model.timesteps},"
        f" objective={model.sampler.objective}) -> {cfg.sample_steps}-step student"
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

    distiller = ConsistencyDistiller(
        model,
        grid_steps=cfg.grid_steps,
        rho=cfg.rho,
        sigma_min=cfg.sigma_min,
        sigma_max=cfg.sigma_max,
        sigma_data=cfg.sigma_data,
        ema_decay=cfg.ema_decay,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip,
        loss=cfg.loss,
        teacher_order=cfg.teacher_order,
        mode=cfg.mode,
        mesh=mesh,
    )
    params, losses = distiller.distill(
        batches(), steps=cfg.steps, key=jax.random.PRNGKey(cfg.seed),
        log_every=cfg.log_every,
    )

    student = distiller.student_model(params, sample_steps=cfg.sample_steps)
    path = student.save_to(cfg.output_path)
    logging.info(f"Consistency student saved to : {path}")
    if losses:
        logging.info(f"  loss: first {losses[0]:.5f} -> last {losses[-1]:.5f}")


if __name__ == "__main__":
    main()
