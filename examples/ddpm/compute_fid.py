"""Compute FID between dataset images and model samples.

The reference has no FID code (SURVEY §6); this provides the parity-tracking
tool the north-star metric references. Uses the framework's
feature-extractor-agnostic FID (metrics/fid.py); plug a real InceptionV3
extractor via --feature for standard FID numbers.
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from common import hydra_runner

from diffusion_model_nemo_tpu.data import build_dataloader
from diffusion_model_nemo_tpu.metrics import FIDScorer
from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.utils import logging
from diffusion_model_nemo_tpu.utils.image import to_uint8


@dataclass
class FIDConfig:
    model_path: str = "DDPM.dmn"
    dataset_name: Optional[str] = None
    dataset_path: Optional[str] = None  # for dataset_name=file (offline data)
    dataset_split: str = "test"
    num_samples: int = 1024
    batch_size: int = 64
    use_ddim_sampler: bool = True
    ddim_timesteps: int = 50
    seed: int = 0
    use_ema: bool = True
    # Standard Inception FID: path to a local torchvision/pytorch-fid
    # InceptionV3 checkpoint (.pth/.pt/.bin/.npz). Unset → the on-chip
    # extractor runs with seeded RANDOM weights: a relative regression
    # metric only, labeled as such in the output.
    feature_weights_path: Optional[str] = None
    # 'inception' (default) or 'pixels' (the old weight-free moments fallback)
    feature_extractor: str = "inception"
    # Companion metrics (metrics/scores.py): KID (unbiased MMD² on the same
    # pool3 features) and Inception Score (needs the extractor's fc head —
    # present in torchvision / pytorch-fid checkpoints).
    compute_kid: bool = False
    kid_subset_size: Optional[int] = None  # default min(N, M, 1000)
    compute_is: bool = False
    is_splits: int = 10


@hydra_runner(config_path=None, config_name="FIDConfig", schema=FIDConfig)
def main(cfg):
    cfg = FIDConfig(**cfg)
    model = DDPM.restore_from(cfg.model_path, use_ema=cfg.use_ema)
    if cfg.use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = 0.0
        sampler_cfg["ddim_timesteps"] = cfg.ddim_timesteps
        model.change_sampler(sampler_cfg)

    name = cfg.dataset_name or (model.cfg.get("train_ds") or {}).get("name")
    ds_cfg = {"name": name, "split": cfg.dataset_split, "batch_size": cfg.batch_size}
    if cfg.dataset_path:
        ds_cfg["path"] = cfg.dataset_path
    dl = build_dataloader(ds_cfg, mode="test")

    if cfg.compute_is and cfg.feature_extractor != "inception":
        raise ValueError("compute_is requires feature_extractor=inception")
    if cfg.feature_extractor == "inception":
        from diffusion_model_nemo_tpu.metrics import inception_feature_fn

        # with_logits shares one trunk pass between FID features and IS probs
        feature_fn = inception_feature_fn(
            weights_path=cfg.feature_weights_path,
            batch_size=cfg.batch_size,
            with_logits=cfg.compute_is,
        )
        label = (
            "InceptionV3-pool3 (standard FID)"
            if not feature_fn.using_random_weights
            else "InceptionV3-pool3 with RANDOM weights (relative metric only)"
        )
    else:
        feature_fn, label = None, "pixel moments (relative metric only)"
    logging.info(f"FID feature extractor: {label}")

    def extract(images):
        """→ (features, probs-or-None) regardless of extractor flavor."""
        if feature_fn is None:
            from diffusion_model_nemo_tpu.metrics.fid import default_feature_fn

            return default_feature_fn(images), None
        out = feature_fn(images)
        return out if cfg.compute_is else (out, None)

    scorer = FIDScorer(feature_fn=None)
    seen = 0
    for batch in dl:
        scorer.update_real_features(extract(batch["image"])[0])
        seen += batch["image"].shape[0]
        if seen >= cfg.num_samples:
            break

    key = jax.random.PRNGKey(cfg.seed)
    generated = 0
    gen_probs = []
    while generated < cfg.num_samples:
        key, sub = jax.random.split(key)
        imgs = model.sample(
            batch_size=cfg.batch_size, image_size=int(model.image_size), key=sub
        )
        feats, probs = extract(to_uint8(np.asarray(imgs)))
        scorer.update_generated_features(feats)
        if probs is not None:
            gen_probs.append(probs)
        generated += cfg.batch_size
        logging.info(f"generated {generated}/{cfg.num_samples}")

    fid = scorer.compute()
    logging.info(f"FID [{label}] ({generated} generated vs {seen} real): {fid:.4f}")
    print(f"FID: {fid:.4f} [{label}]")
    if cfg.compute_kid:
        kid_mean, kid_std = scorer.compute_kid(subset_size=cfg.kid_subset_size)
        print(f"KID: {kid_mean:.6f} +/- {kid_std:.6f} [{label}]")
    if cfg.compute_is:
        from diffusion_model_nemo_tpu.metrics import inception_score

        is_mean, is_std = inception_score(np.concatenate(gen_probs), splits=cfg.is_splits)
        print(f"IS: {is_mean:.4f} +/- {is_std:.4f} [{label}]")


if __name__ == "__main__":
    main()
