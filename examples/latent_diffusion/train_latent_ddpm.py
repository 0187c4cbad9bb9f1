"""Train a latent DDPM on a frozen AutoencoderKL first stage (beyond the
reference's model families; same CLI surface as examples/ddpm/train_ddpm.py).

# CIFAR-10 on a trained first stage
python train_latent_ddpm.py \
    --config-path="../configs/latent_diffusion" --config-name="latent_ddpm.yaml" \
    model.image_size=32 model.first_stage.restore_from=AutoencoderKL.dmn \
    model.diffusion_model.input_dim=8 \
    model.train_ds.name="cifar10" model.train_ds.split="train" \
    trainer.max_epochs=20
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import LatentDiffusion
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/latent_diffusion", config_name="latent_ddpm.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")

    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    model = LatentDiffusion(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)
    model.init_params()

    # LDM's one-time latent normalization: scale_factor = 1/std(z) measured on
    # the first training batch (persisted into the archive config).
    if bool(cfg.model.get("calibrate_scale_factor", False)):
        model.setup_training_data(cfg.model.train_ds)
        first = next(iter(model._train_dl))
        model.calibrate_scale_factor(first)

    resume_state = hooks.resume_state if hooks else None
    trainer.fit(model, resume_state=resume_state)


if __name__ == "__main__":
    main()
