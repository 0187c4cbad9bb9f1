"""Dataset-level EDM evaluation: lambda-weighted denoising loss (the paper's
own training/eval metric) plus the probability-flow-ODE NLL in bits/dim
(boundary-truncated at sigma_min — counterpart of
examples/score_sde/test_score_sde.py for the EDM family; conditional archives
evaluate with the dataset's labels bound)."""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.models import EDM, restore_model_from_archive
from diffusion_model_nemo_tpu.training import Trainer
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class TestConfig:
    model_path: Optional[str] = "EDM.dmn"
    # Hub-name fallback, same surface as reference test scripts.
    pretrained_model: Optional[str] = None
    dataset_name: Optional[str] = None
    dataset_split: str = "test"
    batch_size: int = 32
    limit_test_batches: Optional[int] = None
    compute_nll: bool = True
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="TestConfig", schema=TestConfig)
def main(cfg):
    cfg = TestConfig(**cfg)
    if cfg.model_path:
        model = restore_model_from_archive(cfg.model_path, use_ema=cfg.use_ema)
    else:
        model = EDM.from_pretrained(cfg.pretrained_model, use_ema=cfg.use_ema)
    model.cfg["compute_nll"] = bool(cfg.compute_nll)
    name = cfg.dataset_name or (model.cfg.get("train_ds") or {}).get("name")
    model.setup_test_data({"name": name, "split": cfg.dataset_split, "batch_size": cfg.batch_size})
    trainer = Trainer(devices=-1, limit_test_batches=cfg.limit_test_batches)
    result = trainer.test(model)
    logging.info(f"Result: {result}")


if __name__ == "__main__":
    main()
