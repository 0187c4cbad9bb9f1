"""Synthesize waveforms from mel features with a trained vocoder archive.

Fast synthesis: searches a short noise schedule (WaveGrad's 6-50 step trick)
before running the chain.
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.data import build_dataloader
from diffusion_model_nemo_tpu.models import WavegradVocoderModel
from diffusion_model_nemo_tpu.utils import logging


@dataclass
class VocodeConfig:
    model_path: str = "Wavegrad-Vocoder.dmn"
    batch_size: int = 4
    sample_timesteps: int = 50   # short-schedule synthesis; -1 = full chain
    search_iters: int = 500
    output_dir: str = "vocoded"
    seed: int = 0
    use_ema: bool = True


@hydra_runner(config_path=None, config_name="VocodeConfig", schema=VocodeConfig)
def main(cfg):
    cfg = VocodeConfig(**cfg)
    model = WavegradVocoderModel.restore_from(cfg.model_path, use_ema=cfg.use_ema)

    if cfg.sample_timesteps > 0:
        model.sampler.search_noise_schedule_coefficients(
            timesteps=cfg.sample_timesteps, iters=cfg.search_iters, seed=0, verbose=False
        )
        model.sampler.change_noise_schedule(verbose=False)
        model.sampler.compute_constants(cfg.sample_timesteps)
        model._jit_cache.clear()

    # Features from held-out waveforms (swap in your own mel source here).
    dl = build_dataloader(
        dict(model.cfg.train_ds, batch_size=cfg.batch_size), mode="test"
    )
    batch = next(iter(dl))
    wav = jnp.asarray(batch["audio"])
    mel = model.compute_mel(wav)

    out = model.vocode(mel, key=jax.random.PRNGKey(cfg.seed))
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "vocoded.npy", np.asarray(out))
    np.save(out_dir / "reference.npy", np.asarray(wav))
    logging.info(f"Saved {out.shape[0]} waveforms ({out.shape[1]} samples) to {out_dir}")


if __name__ == "__main__":
    main()
