"""WaveGrad audio vocoder: features, network, training, synthesis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import WavegradVocoderModel
from diffusion_model_nemo_tpu.ops.audio import (
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)
from diffusion_model_nemo_tpu.training import Trainer

pytestmark = pytest.mark.slow  # subprocess e2e drives dominate suite wall-clock

HOP = 60  # tiny: 5*3*2*2 = 60
SEG_FRAMES = 4
SEG = HOP * SEG_FRAMES


def vocoder_cfg(tmp_path):
    return from_dict(
        {
            "timesteps": 10,
            "channels": 1,
            "image_size": 0,
            "save_every": 0,
            "audio": {
                "sample_rate": 8000,
                "n_fft": 128,
                "hop": HOP,
                "n_mels": 16,
                "segment_frames": SEG_FRAMES,
            },
            "train_ds": {
                "name": "synthetic_audio",
                "segment_length": SEG,
                "length": 32,
                "batch_size": 8,
                "shuffle": True,
            },
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.WaveGradVocoder",
                "n_mels": 16,
                "hop": HOP,
                "upsample_factors": [5, 3, 2, 2],
                "up_channels": [16, 16, 8, 8],
                "down_channels": [8, 8, 16],
                "base_channels": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.WaveGradDiffusion",
                "timesteps": 10,
                "schedule_name": "linear",
                "schedule_cfg": {"linear": {"beta_start": 1e-4, "beta_end": 0.05}},
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l1"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )


def test_stft_and_mel_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, SEG).astype(np.float32))
    mag = stft_magnitude(x, n_fft=128, hop=HOP)
    assert mag.shape[0] == 2 and mag.shape[2] == 65
    fb = mel_filterbank(n_mels=16, n_fft=128, sample_rate=8000)
    assert fb.shape == (65, 16)
    # every fft bin inside [fmin, fmax] contributes to some mel bin
    assert float(fb.sum()) > 0
    mel = log_mel_spectrogram(x, fb, n_fft=128, hop=HOP)
    assert mel.shape[0] == 2 and mel.shape[2] == 16
    assert np.all(np.isfinite(np.asarray(mel)))


def test_mel_detects_frequency():
    """A high-frequency tone must light up higher mel bins than a low one."""
    sr, T = 8000, 4096
    t = np.arange(T) / sr
    fb = mel_filterbank(n_mels=16, n_fft=256, sample_rate=sr)
    lo = jnp.asarray(np.sin(2 * np.pi * 200 * t, dtype=np.float64).astype(np.float32))[None]
    hi = jnp.asarray(np.sin(2 * np.pi * 3000 * t, dtype=np.float64).astype(np.float32))[None]
    mel_lo = np.asarray(log_mel_spectrogram(lo, fb, n_fft=256, hop=64)).mean(axis=(0, 1))
    mel_hi = np.asarray(log_mel_spectrogram(hi, fb, n_fft=256, hop=64)).mean(axis=(0, 1))
    assert mel_lo.argmax() < mel_hi.argmax()


def test_vocoder_trains_and_synthesizes(tmp_path):
    cfg = vocoder_cfg(tmp_path)
    model = WavegradVocoderModel(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    trainer = Trainer(devices=-1, max_steps=2, log_every_n_steps=1)
    trainer.fit(model)
    for leaf in jax.tree.leaves(model.params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # mel → waveform synthesis
    wav = jnp.asarray(np.random.RandomState(1).randn(2, SEG).astype(np.float32) * 0.1)
    mel = model.compute_mel(wav)
    assert mel.shape == (2, SEG_FRAMES, 16)
    out = model.vocode(mel, key=jax.random.PRNGKey(2))
    assert out.shape == (2, SEG)
    assert np.all(np.isfinite(np.asarray(out)))

    # fast re-scheduled synthesis (WaveGrad's 6-step style trick)
    model.sampler.search_noise_schedule_coefficients(timesteps=4, iters=10, seed=0, verbose=False)
    model.sampler.change_noise_schedule(verbose=False)
    model.sampler.compute_constants(4)
    model._jit_cache.clear()
    fast = model.vocode(mel, key=jax.random.PRNGKey(3))
    assert fast.shape == (2, SEG)


def test_vocoder_archive_roundtrip(tmp_path):
    cfg = vocoder_cfg(tmp_path)
    model = WavegradVocoderModel(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "voc.dmn")
    model.save_to(path)
    restored = WavegradVocoderModel.restore_from(path)
    assert restored.hop == HOP
    a = jax.tree.leaves(model.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_vocoder_mesh_sharded_vocode_matches(tmp_path):
    """vocode(mesh=...) shards the utterance batch over the data axis and
    must reproduce the unsharded waveforms (same keys, same params)."""
    from diffusion_model_nemo_tpu.parallel import make_mesh

    cfg = vocoder_cfg(tmp_path)
    model = WavegradVocoderModel(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    wav = jnp.asarray(np.random.RandomState(1).randn(8, SEG).astype(np.float32) * 0.1)
    mel = model.compute_mel(wav)
    key = jax.random.PRNGKey(2)

    plain = model.vocode(mel, key=key)
    model._jit_cache.clear()
    sharded = model.vocode(mel, key=key, mesh=make_mesh())

    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
