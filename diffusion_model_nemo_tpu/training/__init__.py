from .checkpoints import CheckpointManager, load_archive, load_aux_weights, save_archive
from .consistency import ConsistencyDistiller
from .reflow import ReflowTrainer
from .distillation import ProgressiveDistiller, predict_eps_x0
from .ema import ema_update, init_ema
from .lora import LoRAFinetuner, load_adapters, lora_init, merge_adapters, save_adapters
from .exp_manager import ExpManagerHooks, exp_manager
from .optim import build_lr_schedule, build_optimizer
from .posthoc_ema import PostHocEMA, reconstruct as reconstruct_posthoc_ema
from .trainer import Trainer
