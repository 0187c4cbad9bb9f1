"""Rectify (reflow) a trained rectified-flow archive into a 1-to-few-step
student (Liu et al. 2022 §3). Beyond the reference's example surface — the
flow-matching counterpart of examples/ddpm/distill_ddpm.py: retrain on the
model's OWN (noise, sample) couplings so the straightened transport samples
well in one Euler step. Needs no dataset — the teacher IS the data source.

Usage:
    python reflow_rectified_flow.py model_path=RF.dmn output_path=RF_1step.dmn \
        steps=4000 batch_size=64 sample_steps=1
"""

import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from common import hydra_runner

from diffusion_model_nemo_tpu.models import restore_model_from_archive
from diffusion_model_nemo_tpu.training.reflow import ReflowTrainer
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class ReflowConfig:
    model_path: str = "RectifiedFlow.dmn"
    output_path: str = "RectifiedFlow_reflowed.dmn"
    use_ema: bool = True

    # rectification schedule
    steps: int = 4000
    rounds: int = 1          # k-rectified flow: each round re-couples from the last
    batch_size: int = 64
    pair_steps: int = -1     # ODE steps for pair generation; -1 = archive's sample_steps
    sample_steps: int = 1    # the packaged student's default NFE

    # optimizer
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip: float = 1.0

    seed: int = 0
    log_every: int = 50
    devices: int = 1  # chips to reflow on (-1 = all); >1 shards latents over a data mesh


@hydra_runner(schema=ReflowConfig)
def main(cfg):
    model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    if type(model).__name__ != "RectifiedFlow":
        raise ValueError(
            f"reflow applies to RectifiedFlow archives, got {type(model).__name__} "
            "(DDPM-family models distill via distill_ddpm.py / consistency_ddpm.py)"
        )
    logging.info(
        f"Reflowing {type(model).__name__} ({cfg.rounds} round(s) x {cfg.steps} steps) "
        f"-> {cfg.sample_steps}-step student"
    )

    mesh = None
    if int(cfg.devices) not in (0, 1):
        from diffusion_model_nemo_tpu.parallel.sharding import make_strategy_mesh

        all_dev = jax.devices()
        n = len(all_dev) if int(cfg.devices) == -1 else min(int(cfg.devices), len(all_dev))
        if n > 1:
            mesh = make_strategy_mesh(all_dev[:n], "ddp")

    trainer = ReflowTrainer(
        model,
        pair_steps=(cfg.pair_steps if cfg.pair_steps > 0 else None),
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        grad_clip=cfg.grad_clip,
        mesh=mesh,
    )
    params, losses = trainer.reflow(
        steps=cfg.steps,
        batch_size=cfg.batch_size,
        key=jax.random.PRNGKey(cfg.seed),
        rounds=cfg.rounds,
        log_every=cfg.log_every,
    )

    student = trainer.student_model(params, sample_steps=cfg.sample_steps)
    path = student.save_to(cfg.output_path)
    logging.info(f"Reflowed student saved to : {path}")
    if losses:
        logging.info(f"  loss: first {losses[0]:.5f} -> last {losses[-1]:.5f}")


if __name__ == "__main__":
    main()
