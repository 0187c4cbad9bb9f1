"""Data pipeline: loaders, collation, on-device preprocessing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.data import (
    DataLoader,
    SyntheticAudioDataset,
    SyntheticVisionDataset,
    build_dataloader,
    get_reverse_transform,
    preprocess_batch,
)


def test_vision_loader_shapes_and_epochs():
    ds = SyntheticVisionDataset(image_size=8, channels=1, length=20)
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (8, 8, 8, 1)
    assert batches[0]["image"].dtype == np.uint8
    assert batches[0]["label"].shape == (8,)
    # different epoch → different order
    b2 = list(dl)
    assert not np.array_equal(batches[0]["image"], b2[0]["image"])


def test_audio_loader():
    ds = SyntheticAudioDataset(segment_length=240, length=16)
    dl = DataLoader(ds, batch_size=4)
    batch = next(iter(dl))
    assert batch["audio"].shape == (4, 240)
    assert batch["audio"].dtype == np.float32
    assert np.abs(batch["audio"]).max() <= 1.0


def test_build_dataloader_synthetic_variants():
    dl = build_dataloader({"name": "synthetic", "image_size": 8, "channels": 3,
                           "length": 16, "batch_size": 4}, mode="train")
    assert next(iter(dl))["image"].shape == (4, 8, 8, 3)
    dla = build_dataloader({"name": "synthetic_audio", "segment_length": 120,
                            "length": 8, "batch_size": 4}, mode="train")
    assert next(iter(dla))["audio"].shape == (4, 120)


def test_preprocess_batch_scaling_and_flip():
    img = np.zeros((4, 4, 6, 1), np.uint8)
    img[:, :, :3, :] = 255  # left half white
    batch = {"image": jnp.asarray(img), "label": jnp.zeros((4,), jnp.int32)}

    out = preprocess_batch(batch, key=None, train=False)
    x = np.asarray(out["pixel_values"])
    assert x.min() == -1.0 and x.max() == 1.0  # [-1, 1] scaling
    assert out["label"].dtype == jnp.int32

    # with a flip key, some examples should be mirrored
    out2 = preprocess_batch(batch, key=jax.random.PRNGKey(3), train=True)
    x2 = np.asarray(out2["pixel_values"])
    flipped = np.array([not np.array_equal(x2[i], x[i]) for i in range(4)])
    assert flipped.any() and not flipped.all()  # ~50% flip probability


def test_reverse_transform():
    rev = get_reverse_transform(inverse_scale=True, uint=True)
    x = np.full((2, 2, 1), -1.0, np.float32)
    out = rev(x)
    assert out.dtype == np.uint8 and out.max() == 0
    out2 = get_reverse_transform(inverse_scale=True, uint=True)(np.ones((2, 2, 1), np.float32))
    assert out2.min() == 255


def test_synthetic_loader_defaults_num_classes_from_model():
    """Synthetic labels must stay inside the model's class-embedding table:
    out-of-range indices hit jnp.take's out-of-bounds NaN fill (regression —
    model.num_classes=4 with the synthetic default of 10 NaN'd step 1)."""
    from diffusion_model_nemo_tpu.models import ConditionalDDPM

    cfg = {
        "image_size": 8,
        "channels": 1,
        "timesteps": 10,
        "num_classes": 4,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
            "num_classes": 4,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
            "class_conditional": True,
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }
    model = ConditionalDDPM(cfg=cfg)
    model.setup_training_data({"name": "synthetic", "batch_size": 16, "length": 64})
    labels = np.concatenate([np.asarray(b["label"]) for b in model._train_dl])
    assert labels.max() < 4, labels.max()
