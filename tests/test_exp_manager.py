"""exp_manager: TB event files, hparams dump, metric routing."""

from pathlib import Path

import numpy as np
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.training import Trainer, exp_manager


def test_exp_manager_creates_dirs_and_tb_events(tmp_path):
    trainer = Trainer(devices=1, max_steps=1)
    cfg = from_dict(
        {
            "exp_dir": str(tmp_path),
            "name": "Exp",
            "version": "v0",
            "create_tensorboard_logger": True,
            "create_checkpoint_callback": False,
        }
    )
    hooks = exp_manager(trainer, cfg)
    log_dir = tmp_path / "Exp" / "v0"
    assert (log_dir / "hparams.yaml").exists()

    hooks.log_metrics({"train_loss": 1.25, "learning_rate": 1e-3}, step=7)
    if hooks.tb_writer:
        hooks.tb_writer.flush()
        events = list((log_dir / "tensorboard").glob("events.*"))
        assert events and events[0].stat().st_size > 0


def test_exp_manager_none_cfg_is_noop():
    trainer = Trainer(devices=1, max_steps=1)
    assert exp_manager(trainer, None) is None
    trainer._log_metrics({"train_loss": 1.0}, 1)  # plain-log path works


def test_trainer_nan_detection(tmp_path):
    import jax
    import jax.numpy as jnp

    from diffusion_model_nemo_tpu.models import DDPM
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    # absurd LR to force divergence... instead monkeypatch the loss to NaN
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    orig = model.training_step

    def nan_step(params, batch, key, step):
        loss, metrics = orig(params, batch, key, step)
        bad = loss * jnp.nan
        return bad, {"train_loss": bad}

    model.training_step = nan_step
    trainer = Trainer(devices=1, max_steps=2, log_every_n_steps=1, terminate_on_nan=True)
    with pytest.raises(FloatingPointError, match="Non-finite train_loss"):
        trainer.fit(model)
