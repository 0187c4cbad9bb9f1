"""DMN_SAMPLE_SCAN_UNROLL is a pure perf knob: the math is unchanged, only
XLA's schedule. The ancestral (DDPM) chain is bitwise identical under unroll;
the DDIM step's fused interpolation math reassociates under unroll, so it is
pinned to compiler-rounding tolerance instead (measured max |d| ~3e-8).
tools/microbench_unroll.py measures the schedule effect on chip."""

import numpy as np
import jax
import pytest

from diffusion_model_nemo_tpu.modules import diffusion_process
from tests.test_models_e2e import IMG, base_cfg


@pytest.fixture
def model(tmp_path):
    from diffusion_model_nemo_tpu.models import DDPM

    cfg = base_cfg(
        tmp_path,
        sampler={
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 5,
            "schedule_name": "linear",
        },
    )
    m = DDPM(cfg=cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.mark.parametrize("unroll", [2, 5])
def test_unrolled_sampling_bitwise_identical(model, monkeypatch, unroll):
    key = jax.random.PRNGKey(3)
    ref = np.asarray(model.sample(batch_size=2, image_size=IMG, key=key))
    monkeypatch.setenv("DMN_SAMPLE_SCAN_UNROLL", str(unroll))
    assert diffusion_process._scan_unroll() == unroll
    model._jit_cache.clear()  # knob is read at trace time
    got = np.asarray(model.sample(batch_size=2, image_size=IMG, key=key))
    assert np.array_equal(ref, got)


def test_unrolled_ddim_bitwise_identical(model, monkeypatch):
    model.change_sampler(
        {
            "_target_": "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion",
            "timesteps": 5,
            "schedule_name": "linear",
            "ddim_timesteps": 4,
            "eta": 0.0,
        }
    )
    key = jax.random.PRNGKey(4)
    ref = np.asarray(model.sample(batch_size=2, image_size=IMG, key=key))
    monkeypatch.setenv("DMN_SAMPLE_SCAN_UNROLL", "2")
    model._jit_cache.clear()
    got = np.asarray(model.sample(batch_size=2, image_size=IMG, key=key))
    np.testing.assert_allclose(ref, got, rtol=0, atol=1e-6)
