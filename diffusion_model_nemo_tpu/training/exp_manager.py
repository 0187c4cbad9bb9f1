"""Experiment manager: results dirs, TensorBoard/W&B logging, checkpoints, resume.

Replacement for NeMo's ``exp_manager`` (the reference configures it from the
``exp_manager`` YAML block, examples/configs/ddpm/unet_small.yaml:101-123):
creates ``exp_dir/name/version``, attaches a TensorBoard (tensorboardX)
writer and optional wandb run, wires top-k checkpointing on a monitored
metric into the Trainer, honors ``resume_if_exists`` /
``resume_ignore_no_checkpoint``, and saves the final single-file archive
(``always_save_nemo`` equivalent).
"""

from __future__ import annotations

import datetime
import os
from pathlib import Path
from typing import Any, Dict, Optional

from ..config.yaml_config import Config, from_dict, to_yaml
from ..utils import logging
from .checkpoints import CheckpointManager

__all__ = ["exp_manager", "ExpManagerHooks"]


class ExpManagerHooks:
    def __init__(self, log_dir: Path, cfg: Config, model_name: str):
        self.log_dir = log_dir
        self.cfg = cfg
        self.model_name = model_name
        self.tb_writer = None
        self.wandb_run = None
        self.ckpt_mgr: Optional[CheckpointManager] = None
        self.ckpt_every = int(cfg.get("checkpoint_every_n_steps", 1000))
        self.always_save_archive = bool(
            (cfg.get("checkpoint_callback_params") or {}).get("always_save_nemo", True)
        )

        if cfg.get("create_tensorboard_logger", True):
            try:
                from tensorboardX import SummaryWriter

                self.tb_writer = SummaryWriter(logdir=str(log_dir / "tensorboard"))
            except Exception as e:  # pragma: no cover
                logging.warning(f"TensorBoard logger unavailable: {e}")

        if cfg.get("create_wandb_logger", False):
            try:
                import wandb

                kwargs = dict(cfg.get("wandb_logger_kwargs") or {})
                self.wandb_run = wandb.init(dir=str(log_dir), **kwargs)
            except Exception as e:  # pragma: no cover
                logging.warning(f"wandb logger unavailable: {e}")

        ckpt_params = cfg.get("checkpoint_callback_params") or {}
        if cfg.get("create_checkpoint_callback", True):
            self.ckpt_mgr = CheckpointManager(
                str(log_dir / "checkpoints"),
                max_to_keep=int(ckpt_params.get("save_top_k", 1)),
                monitor=ckpt_params.get("monitor", "train_loss"),
                mode=ckpt_params.get("mode", "min"),
                save_interval_steps=self.ckpt_every,
            )

    # ---- Trainer-facing hooks ------------------------------------------------
    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        scalars = {k: v for k, v in metrics.items() if isinstance(v, (int, float))}
        if self.tb_writer:
            for k, v in scalars.items():
                self.tb_writer.add_scalar(k, v, step)
        if self.wandb_run:
            self.wandb_run.log(scalars, step=step)
        pretty = ", ".join(f"{k}={v:.5g}" for k, v in scalars.items())
        logging.info(f"step {step}: {pretty}")

    def log_images(self, tag: str, images, step: int) -> None:
        """Log a sample grid to TB/wandb (images: [B, H, W, C] in [0, 1])."""
        from ..utils.image import make_grid

        grid = make_grid(images, nrow=6)  # HWC uint8
        if self.tb_writer:
            self.tb_writer.add_image(tag, grid, step, dataformats="HWC")
        if self.wandb_run:
            import wandb

            self.wandb_run.log({tag: wandb.Image(grid)}, step=step)

    def should_checkpoint(self, step: int) -> bool:
        """The single source of the save cadence. The Trainer consults this
        BEFORE materializing the monitored metric: fetching it costs a device
        sync, which must not happen on non-checkpoint steps."""
        return bool(self.ckpt_mgr) and step % self.ckpt_every == 0

    def maybe_checkpoint(self, step: int, state: Dict[str, Any], metrics=None) -> None:
        if self.should_checkpoint(step):
            self.ckpt_mgr.save(step, _host_state(state), metrics=metrics)

    def finalize(self, model, state: Dict[str, Any]) -> None:
        if self.ckpt_mgr:
            self.ckpt_mgr.save(int(state["step"]), _host_state(state))
            self.ckpt_mgr.wait()
        if self.always_save_archive:
            path = str(self.log_dir / f"{self.model_name}.dmn")
            model.save_to(path)
            logging.info(f"Final model archive saved to {path}")
        if self.tb_writer:
            self.tb_writer.flush()

    # ---- resume ------------------------------------------------------------------
    def try_resume(self) -> Optional[Dict[str, Any]]:
        if self.ckpt_mgr is None:
            return None
        step = self.ckpt_mgr.latest_step()
        if step is None:
            return None
        state = self.ckpt_mgr.restore(step)
        logging.info(f"Found checkpoint at step {step}; resuming")
        return state


def _host_state(state: Dict[str, Any]) -> Dict[str, Any]:
    """Copy device arrays to host numpy before handing to (async) orbax —
    the live buffers are donated by the next train-step call.

    Multi-host: a jax.Array sharded across processes (fsdp under
    jax.distributed) is not fully addressable locally, so np.asarray would
    raise; such leaves are gathered with process_allgather first (every
    process then writes identical full checkpoints, matching the
    single-file restore path)."""
    import jax
    import numpy as np

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(to_host, state)


def exp_manager(trainer, cfg) -> Optional[ExpManagerHooks]:
    """Attach experiment management to a Trainer; returns hooks (or None)."""
    if cfg is None:
        return None
    cfg = from_dict(cfg)
    exp_dir = cfg.get("exp_dir") or "./nemo_experiments"
    name = cfg.get("name") or "default"
    version = cfg.get("version")
    if version is None:
        version = (
            cfg.get("use_datetime_version", True)
            and datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
            or "version_0"
        )
    log_dir = Path(exp_dir).absolute() / name / str(version)
    log_dir.mkdir(parents=True, exist_ok=True)

    hooks = ExpManagerHooks(log_dir, cfg, model_name=name)
    trainer.exp_manager_hooks = hooks

    (log_dir / "hparams.yaml").write_text(to_yaml(cfg))
    logging.info(f"Experiment directory : {log_dir}")

    if cfg.get("resume_if_exists", False):
        state = hooks.try_resume()
        if state is None and not cfg.get("resume_ignore_no_checkpoint", False):
            logging.warning("resume_if_exists=True but no checkpoint found")
        hooks.resume_state = state
    else:
        hooks.resume_state = None
    return hooks
