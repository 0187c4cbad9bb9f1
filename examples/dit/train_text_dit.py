"""Train a text-conditional DiT DDPM (caption cross-attention).

Beyond the reference's surface (its only conditioning is a class label):
the batch carries byte-tokenized captions, the DiT cross-attends to them,
and ~cond_drop_prob of captions are masked to the null context during
training — the classifier-free-guidance joint-training recipe over text.

# Offline synthetic captions ("a photo of class N"):
python train_text_dit.py \
    --config-path="../configs/dit" --config-name="text_dit_small.yaml" \
    model.image_size=32 model.train_ds.name=synthetic \
    trainer.max_steps=2000

# Real data: a directory of images + captions.txt (one caption per line,
# aligned to the sorted file order):
python train_text_dit.py \
    --config-path="../configs/dit" --config-name="text_dit_small.yaml" \
    model.image_size=32 model.train_ds.name=file \
    +model.train_ds.path=/data/my_images
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner

from diffusion_model_nemo_tpu.config import to_yaml
from diffusion_model_nemo_tpu.models import TextConditionalDDPM
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from diffusion_model_nemo_tpu.utils import logging


@hydra_runner(config_path="../configs/dit", config_name="text_dit_small.yaml")
def main(cfg):
    logging.info(f"Config:\n{to_yaml(cfg)}")

    trainer = Trainer(**cfg.trainer)
    hooks = exp_manager(trainer, cfg.get("exp_manager"))
    model = TextConditionalDDPM(cfg=cfg.model, trainer=trainer)
    model.maybe_init_from_pretrained_checkpoint(cfg)

    resume_state = hooks.resume_state if hooks else None
    trainer.fit(model, resume_state=resume_state)


if __name__ == "__main__":
    main()
