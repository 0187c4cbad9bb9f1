"""Train the KL-autoencoder first stage for latent diffusion (beyond the
reference's model families; same CLI surface as examples/ddpm/train_ddpm.py).

# CIFAR-10 (f=4 → 8x8x4 latents)
python train_autoencoder_kl.py \
    --config-path="../configs/latent_diffusion" --config-name="autoencoder_kl.yaml" \
    model.image_size=32 model.train_ds.name="cifar10" model.train_ds.split="train" \
    trainer.max_epochs=20
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import AutoencoderKLModel
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/latent_diffusion", config_name="autoencoder_kl.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")

    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    model = AutoencoderKLModel(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)

    resume_state = hooks.resume_state if hooks else None
    trainer.fit(model, resume_state=resume_state)


if __name__ == "__main__":
    main()
