"""Dataset-level bits/dim for a trained WavegradDDPM archive
(counterpart of reference examples/wavegrad_ddpm/test_wavegrad_ddpm.py)."""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.models import WavegradDDPM
from diffusion_model_nemo_tpu.training import Trainer
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class TestConfig:
    model_path: Optional[str] = "WavegradDDPM.dmn"
    # Hub-name fallback, same surface as reference test scripts
    # (examples/*/test_*.py:80-83: restore_from if a local archive is
    # given, else from_pretrained). No hub exists in this build: a local
    # path still loads; a hub name raises NotImplementedError.
    pretrained_model: Optional[str] = None
    dataset_name: Optional[str] = None
    dataset_split: str = "test"
    batch_size: int = 32
    limit_test_batches: Optional[int] = None
    use_ema: bool = True
    search_timesteps: int = 50
    search_iters: int = 100


@hydra_runner(config_path=None, config_name="TestConfig", schema=TestConfig)
def main(cfg):
    cfg = TestConfig(**cfg)
    if cfg.model_path:
        model = WavegradDDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    else:
        model = WavegradDDPM.from_pretrained(cfg.pretrained_model, use_ema=cfg.use_ema)
    if cfg.search_timesteps > 0:
        # reference test_wavegrad_ddpm re-searches a short schedule first
        model.sampler.search_noise_schedule_coefficients(
            timesteps=cfg.search_timesteps, iters=cfg.search_iters, seed=0, verbose=False)
        model.sampler.change_noise_schedule(verbose=False)
        model.sampler.compute_constants(cfg.search_timesteps)
        model._jit_cache.clear()
    name = cfg.dataset_name or (model.cfg.get("train_ds") or {}).get("name")
    model.setup_test_data({"name": name, "split": cfg.dataset_split, "batch_size": cfg.batch_size})
    trainer = Trainer(devices=-1, limit_test_batches=cfg.limit_test_batches)
    result = trainer.test(model)
    logging.info(f"Result: {result}")


if __name__ == "__main__":
    main()
