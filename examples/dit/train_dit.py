"""Train a DDPM with the DiT (Diffusion Transformer) backbone.

The DiT (modules/dit.py) is a drop-in ``diffusion_model`` for every family —
this CLI is the DDPM train script pointed at the DiT config; the backbone is
selected purely by ``model.diffusion_model._target_``. Beyond the
reference's surface (its only network family is the conv U-Net).

# CIFAR-10
python train_dit.py \
    --config-path="../configs/dit" --config-name="dit_small.yaml" \
    model.image_size=32 \
    model.train_ds.name="cifar10" model.train_ds.split="train" \
    model.optim.lr=0.0001 trainer.max_epochs=5

# Mixture-of-experts MLPs with expert-parallel sharding
python train_dit.py \
    --config-path="../configs/dit" --config-name="dit_small.yaml" \
    model.image_size=32 model.train_ds.name=synthetic \
    model.diffusion_model.moe_experts=8 \
    trainer.strategy=expert_parallel trainer.tp_size=4
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import DDPM, ConditionalDDPM
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/dit", config_name="dit_small.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")

    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    # model.num_classes selects the class-conditional family (50% null-class
    # masking during training; sample with label=/guidance_scale= at eval).
    cls = ConditionalDDPM if cfg.model.get("num_classes") else DDPM
    model = cls(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)

    resume_state = hooks.resume_state if hooks else None
    trainer.fit(model, resume_state=resume_state)


if __name__ == "__main__":
    main()
