"""Bitwise reproducibility: same seed → identical training and sampling.

All randomness is explicit jax.random keys derived by fold_in(step), so two
runs with the same seed must match exactly — a property the reference (torch
global RNG + host numpy RNG in WaveGrad) cannot guarantee.
"""

import numpy as np
import jax
import pytest

from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.training import Trainer
from tests.test_training_e2e import tiny_ddpm_cfg


def run_training(tmp_path, seed):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=1, max_steps=3, log_every_n_steps=1, seed=seed)
    trainer.fit(model)
    return model


@pytest.mark.slow
def test_training_bitwise_reproducible(tmp_path):
    m1 = run_training(tmp_path / "a", seed=123)
    m2 = run_training(tmp_path / "b", seed=123)
    for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_training_seed_changes_result(tmp_path):
    m1 = run_training(tmp_path / "a", seed=123)
    m2 = run_training(tmp_path / "b", seed=456)
    diffs = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params))
    ]
    assert max(diffs) > 0


def test_sampling_bitwise_reproducible(tmp_path):
    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)
    a = model.sample(batch_size=4, image_size=8, key=key)
    b = model.sample(batch_size=4, image_size=8, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = model.sample(batch_size=4, image_size=8, key=jax.random.PRNGKey(10))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


@pytest.mark.slow
def test_steps_per_execution_equivalent(tmp_path):
    """steps_per_execution=K scans the SAME step body with the same
    fold_in(base_key, step) stream and data order, so a K-per-dispatch run
    must match single-step dispatch — including a tail shorter than K
    (max_steps=5, K=2 -> groups 2+2+tail 1). Equality is to compiler-rounding
    tolerance, not bitwise: the scanned body and the top-level jit compile to
    slightly different fused kernels (~4e-9 grad-level noise on CPU), and
    Adam's rsqrt(v) amplifies that early in training (measured 6.3e-6 max
    param abs after 5 steps). A seed change moves params by >1e-2, so the
    5e-5 tolerance still discriminates."""
    def run(spe, where):
        cfg = tiny_ddpm_cfg(tmp_path / where)
        model = DDPM(cfg=cfg)
        model.init_params(jax.random.PRNGKey(0))
        trainer = Trainer(
            devices=1, max_steps=5, log_every_n_steps=1, seed=7,
            steps_per_execution=spe,
        )
        trainer.fit(model)
        return model

    m1 = run(1, "a")
    m2 = run(2, "b")
    for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-5)
    for a, b in zip(jax.tree.leaves(m1.ema_params), jax.tree.leaves(m2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-5)
