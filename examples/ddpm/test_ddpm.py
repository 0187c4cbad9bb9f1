"""Dataset-level bits/dim evaluation of a trained DDPM archive
(counterpart of reference examples/ddpm/test_ddpm.py)."""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.training import Trainer
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class TestConfig:
    model_path: Optional[str] = "DDPM.dmn"
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


@hydra_runner(config_path=None, config_name="TestConfig", schema=TestConfig)
def main(cfg):
    cfg = TestConfig(**cfg)
    if cfg.model_path:
        model = DDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    else:
        model = DDPM.from_pretrained(cfg.pretrained_model, use_ema=cfg.use_ema)
    name = cfg.dataset_name or (model.cfg.get("train_ds") or {}).get("name")
    model.setup_test_data(
        {"name": name, "split": cfg.dataset_split, "batch_size": cfg.batch_size}
    )
    trainer = Trainer(devices=-1, limit_test_batches=cfg.limit_test_batches)
    result = trainer.test(model)
    logging.info(f"Result: {result}")


if __name__ == "__main__":
    main()
