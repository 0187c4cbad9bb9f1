"""Train the WaveGrad neural vocoder (mel → waveform)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import WavegradVocoderModel
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/wavegrad_ddpm", config_name="vocoder.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")
    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    model = WavegradVocoderModel(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)
    trainer.fit(model, resume_state=hooks.resume_state if hooks else None)


if __name__ == "__main__":
    main()
