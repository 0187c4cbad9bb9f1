"""Deterministic data order across checkpoint resume.

The loader's iteration order is a pure function of (seed, epoch, batch
index) — the shuffle is epoch-seeded — so ``DataLoader.set_position``
fast-forwards the stream for free, and the Trainer derives the position
from the resumed step. Combined with the step-derived ``fold_in`` key
stream the update fn already uses, a resumed run must be BIT-IDENTICAL to
an uninterrupted one. (The reference loses data order on resume: PTL
restarts its DataLoader from scratch.)
"""

import jax
import numpy as np
import pytest

from diffusion_model_nemo_tpu.data.hf_vision_data import (
    DataLoader,
    SyntheticVisionDataset,
)


def _loader(**kw):
    ds = SyntheticVisionDataset(image_size=8, channels=1, length=32, seed=0)
    return DataLoader(ds, batch_size=8, shuffle=True, seed=3, **kw)


def _take(it, n):
    out = []
    for batch in it:
        out.append(batch)
        if len(out) == n:
            break
    return out


def test_set_position_replays_the_stream():
    # continuous stream: 7 batches = epoch 0 (4) + epoch 1 (3)
    a = _loader()
    stream = _take(iter(a), 4) + _take(iter(a), 3)

    # positioned mid-epoch-0: batches 2..3 of epoch 0, then epoch 1
    b = _loader()
    b.set_position(0, 2)
    replay = _take(iter(b), 2) + _take(iter(b), 3)
    for x, y in zip(stream[2:], replay):
        np.testing.assert_array_equal(x["image"], y["image"])

    # positioned at an epoch boundary
    c = _loader()
    c.set_position(1, 1)
    replay = _take(iter(c), 2)
    for x, y in zip(stream[5:], replay):
        np.testing.assert_array_equal(x["image"], y["image"])


def test_epoch_order_differs_but_is_seed_stable():
    a, b = _loader(), _loader()
    e0 = _take(iter(a), 4)
    e1 = _take(iter(a), 4)
    assert not all(
        np.array_equal(x["image"], y["image"]) for x, y in zip(e0, e1)
    ), "epoch shuffles should differ"
    # same seed, same epoch -> same order
    for x, y in zip(e0, _take(iter(b), 4)):
        np.testing.assert_array_equal(x["image"], y["image"])


@pytest.mark.slow  # two Trainer runs + Orbax round trip
def test_resumed_run_is_bitwise_identical_to_continuous(tmp_path):
    from diffusion_model_nemo_tpu.config import from_dict
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.training import Trainer, exp_manager
    from tests.test_training_e2e import tiny_ddpm_cfg

    def exp_cfg(resume):
        return from_dict(
            {
                "exp_dir": str(tmp_path / "exp"),
                "name": "ResumeDDPM",
                "version": "v0",
                "create_tensorboard_logger": False,
                "create_checkpoint_callback": True,
                "checkpoint_every_n_steps": 3,
                "checkpoint_callback_params": {"save_top_k": 2},
                "resume_if_exists": resume,
                "resume_ignore_no_checkpoint": True,
            }
        )

    cfg = tiny_ddpm_cfg(tmp_path)  # 4 batches/epoch: 6 steps cross an epoch

    # ---- continuous run: 6 steps straight --------------------------------
    cont = DDPM(cfg=cfg)
    cont.init_params(jax.random.PRNGKey(0))
    Trainer(devices=1, max_steps=6, log_every_n_steps=3).fit(cont)

    # ---- interrupted run: 3 steps, checkpoint, fresh process-alike resume
    m1 = DDPM(cfg=cfg)
    m1.init_params(jax.random.PRNGKey(0))
    t1 = Trainer(devices=1, max_steps=3, log_every_n_steps=3)
    h1 = exp_manager(t1, exp_cfg(resume=False))
    t1.fit(m1, resume_state=h1.resume_state)
    h1.ckpt_mgr.wait()

    m2 = DDPM(cfg=cfg)
    m2.init_params(jax.random.PRNGKey(7))  # different init — must be overwritten
    t2 = Trainer(devices=1, max_steps=6, log_every_n_steps=3)
    h2 = exp_manager(t2, exp_cfg(resume=True))
    assert int(h2.resume_state["step"]) == 3
    t2.fit(m2, resume_state=h2.resume_state)

    for a, b in zip(jax.tree.leaves(cont.params), jax.tree.leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(cont.ema_params), jax.tree.leaves(m2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
