"""Progressively distill a trained DDPM archive into a few-step DDIM student
(Salimans & Ho 2022). Beyond the reference's example surface — the reference's
fastest sampler is strided DDIM; this halves the step count phase by phase
while preserving the teacher's sampling distribution.

Usage:
    python distill_ddpm.py model_path=DDPM.dmn output_path=DDPM_distilled.dmn \
        final_steps=125 steps_per_phase=2000 transfer_steps=1000 \
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
from diffusion_model_nemo_tpu.training.distillation import ProgressiveDistiller
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class DistillConfig:
    model_path: str = "DDPM.dmn"
    output_path: str = "DDPM_distilled.dmn"
    use_ema: bool = True

    # distillation schedule
    final_steps: int = 125  # halving target: T/2, T/4, ... down to this
    steps_per_phase: int = 2000
    transfer_steps: int = 1000  # eps->v re-parameterization steps (0 if same objective)
    student_objective: str = "pred_v"  # pred_v | pred_noise | pred_x0

    # optimizer
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    loss_weighting: str = "truncated_snr"  # truncated_snr | uniform

    # guidance distillation (ConditionalDDPM teachers + labeled data only):
    # absorb the 2-call CFG combination at this fixed w into the student's
    # single conditional call (Meng et al. 2023 stage 1)
    guidance_scale: Optional[float] = None

    # data (defaults to the teacher's train_ds; synthetic needs no network)
    dataset_name: Optional[str] = None
    batch_size: int = 64
    dataset_length: int = 4096  # synthetic only
    file_dir: Optional[str] = None  # for dataset_name=file

    seed: int = 0
    log_every: int = 50
    devices: int = 1  # chips to distill on (-1 = all); >1 shards batches over a data mesh


@hydra_runner(schema=DistillConfig)
def main(cfg):
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    logging.info(
        f"Distilling {type(model).__name__} (T={model.timesteps},"
        f" objective={model.sampler.objective}) -> {cfg.final_steps}-step"
        f" {cfg.student_objective} student"
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

    distiller = ProgressiveDistiller(
        model,
        student_objective=cfg.student_objective,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip,
        loss_weighting=cfg.loss_weighting,
        guidance_scale=cfg.guidance_scale,
        mesh=mesh,
    )
    transfer = cfg.transfer_steps if cfg.student_objective != model.sampler.objective else 0
    params, history = distiller.distill(
        batches(),
        final_steps=cfg.final_steps,
        steps_per_phase=cfg.steps_per_phase,
        key=jax.random.PRNGKey(cfg.seed),
        transfer_steps=transfer,
        log_every=cfg.log_every,
    )

    student = distiller.student_model(params, student_steps=cfg.final_steps)
    path = student.save_to(cfg.output_path)
    logging.info(f"Distilled student saved to : {path}")
    for phase, losses in history.items():
        if losses:
            logging.info(f"  phase {phase}: first {losses[0]:.5f} -> last {losses[-1]:.5f}")


if __name__ == "__main__":
    main()
