"""exp_manager: checkpointing + resume round-trip, metric logging."""

import numpy as np
import jax
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.training import Trainer, exp_manager
from tests.test_training_e2e import tiny_ddpm_cfg

pytestmark = pytest.mark.slow  # multi-run Orbax + fsdp resume drives


def exp_cfg(tmp_path, resume=False):
    return from_dict(
        {
            "exp_dir": str(tmp_path / "exp"),
            "name": "TinyDDPM",
            "version": "v0",  # fixed so resume finds the same dir
            "create_tensorboard_logger": False,
            "create_checkpoint_callback": True,
            "checkpoint_every_n_steps": 2,
            "checkpoint_callback_params": {"save_top_k": 2, "always_save_nemo": True},
            "resume_if_exists": resume,
            "resume_ignore_no_checkpoint": True,
        }
    )


def test_checkpoint_and_resume(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)

    # ---- first run: 4 steps, checkpoints every 2 ----
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=1, max_steps=4, log_every_n_steps=2)
    hooks = exp_manager(trainer, exp_cfg(tmp_path))
    trainer.fit(model, resume_state=hooks.resume_state)
    hooks.ckpt_mgr.wait()
    assert hooks.ckpt_mgr.latest_step() == 4
    archive = tmp_path / "exp" / "TinyDDPM" / "v0" / "TinyDDPM.dmn"
    assert archive.exists()

    # ---- second run resumes from step 4 and continues to 6 ----
    model2 = DDPM(cfg=cfg)
    model2.init_params(jax.random.PRNGKey(1))  # different init — must be overwritten
    trainer2 = Trainer(devices=1, max_steps=6, log_every_n_steps=2)
    hooks2 = exp_manager(trainer2, exp_cfg(tmp_path, resume=True))
    assert hooks2.resume_state is not None
    assert int(hooks2.resume_state["step"]) == 4
    trainer2.fit(model2, resume_state=hooks2.resume_state)
    assert trainer2.global_step == 6

    # resumed params came from the checkpoint, not the fresh init
    resumed_leaf = np.asarray(jax.tree.leaves(hooks2.resume_state["params"])[0])
    final_leaf = np.asarray(jax.tree.leaves(model.params)[0])
    np.testing.assert_allclose(resumed_leaf, final_leaf, atol=1e-6)


def test_archive_restore_has_ema(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=1, max_steps=3, log_every_n_steps=1)
    trainer.fit(model)
    path = str(tmp_path / "m.dmn")
    model.save_to(path)

    ema_model = DDPM.restore_from(path, use_ema=True)
    raw_model = DDPM.restore_from(path, use_ema=False)
    a = np.asarray(jax.tree.leaves(ema_model.params)[0])
    b = np.asarray(jax.tree.leaves(raw_model.params)[0])
    assert not np.allclose(a, b)  # EMA lags the raw params after 3 steps


def test_checkpoint_and_resume_under_fsdp(tmp_path):
    """Checkpoint/resume with sharded state (strategy=fsdp): the host copy
    gathers the shards, and resume re-device_puts into the current layout —
    so a run checkpointed under fsdp continues identically."""
    cfg = tiny_ddpm_cfg(tmp_path)
    cfg["diffusion_model"]["dim"] = 32  # wide enough that leaves actually shard
    cfg["diffusion_model"]["resnet_block_groups"] = 8

    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=-1, max_steps=4, log_every_n_steps=2, strategy="fsdp")
    hooks = exp_manager(trainer, exp_cfg(tmp_path))
    trainer.fit(model, resume_state=hooks.resume_state)
    hooks.ckpt_mgr.wait()
    assert hooks.ckpt_mgr.latest_step() == 4

    model2 = DDPM(cfg=cfg)
    model2.init_params(jax.random.PRNGKey(1))
    trainer2 = Trainer(devices=-1, max_steps=6, log_every_n_steps=2, strategy="fsdp")
    hooks2 = exp_manager(trainer2, exp_cfg(tmp_path, resume=True))
    assert int(hooks2.resume_state["step"]) == 4
    trainer2.fit(model2, resume_state=hooks2.resume_state)
    assert trainer2.global_step == 6

    resumed_leaf = np.asarray(jax.tree.leaves(hooks2.resume_state["params"])[0])
    final_leaf = np.asarray(jax.tree.leaves(model.params)[0])
    np.testing.assert_allclose(resumed_leaf, final_leaf, atol=1e-6)
