"""Train an EDM (Karras et al. 2022) model (beyond the reference's model
families; same CLI surface as examples/ddpm/train_ddpm.py).

# CIFAR-10
python train_edm.py \
    --config-path="../configs/edm" --config-name="unet_small.yaml" \
    model.image_size=32 model.diffusion_model.dim_mults=[1,2,2,2] \
    model.train_ds.name="cifar10" model.train_ds.split="train" \
    model.optim.lr=0.0002 trainer.max_epochs=5
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import EDM, ConditionalEDM
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/edm", config_name="unet_small.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")

    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    # model.num_classes selects the class-conditional family (CFG-style
    # joint training; sample with label=/guidance_scale= at eval)
    cls = ConditionalEDM if cfg.model.get("num_classes") else EDM
    model = cls(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)

    resume_state = hooks.resume_state if hooks else None
    trainer.fit(model, resume_state=resume_state)


if __name__ == "__main__":
    main()
