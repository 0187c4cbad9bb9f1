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


# ---- HF datasets loaded from disk (the real `datasets` code path, offline) ----
def _save_hf_dataset(tmp_path, column="img", as_dict=False, grayscale=False, labels=True):
    """Build a real HF dataset with an Image feature (PNG-encoded through
    PIL, exactly what a hub download decodes through) and save_to_disk it."""
    from datasets import Dataset, DatasetDict, Features, Image, Value
    from PIL import Image as PILImage

    rng = np.random.default_rng(0)
    n = 10
    mode = "L" if grayscale else "RGB"
    shape = (12, 12) if grayscale else (12, 12, 3)
    imgs = [PILImage.fromarray(rng.integers(0, 256, shape, dtype=np.uint8), mode)
            for _ in range(n)]
    cols = {column: imgs}
    feats = {column: Image()}
    if labels:
        cols["label"] = list(rng.integers(0, 4, n))
        feats["label"] = Value("int32")
    ds = Dataset.from_dict(cols, features=Features(feats))
    if as_dict:
        ds = DatasetDict({"train": ds, "test": ds.select(range(3))})
    path = str(tmp_path / "hfds")
    ds.save_to_disk(path)
    return path, n


def test_hf_dataset_from_disk(tmp_path):
    path, n = _save_hf_dataset(tmp_path, column="img")
    dl = build_dataloader({"name": path, "batch_size": 5, "shuffle": False}, mode="train")
    batch = next(iter(dl))
    assert batch["image"].shape == (5, 12, 12, 3)
    assert batch["image"].dtype == np.uint8
    assert batch["label"].shape == (5,) and batch["label"].dtype == np.int32
    # PNG encode/decode through the Image feature is lossless — the first
    # item must equal the source pixels.
    from datasets import load_from_disk

    src = np.asarray(load_from_disk(path)[0]["img"])
    assert np.array_equal(batch["image"][0], src)


def test_hf_dataset_dict_split_selection(tmp_path):
    path, _ = _save_hf_dataset(tmp_path, column="image", as_dict=True, labels=False)
    dl = build_dataloader(
        {"name": path, "split": "test", "batch_size": 3, "shuffle": False}, mode="test"
    )
    assert len(list(dl)) == 1  # 3 examples at batch_size 3
    with pytest.raises(ValueError, match="splits"):
        build_dataloader({"name": path, "batch_size": 3}, mode="train")  # no split


def test_hf_dataset_grayscale_gets_channel_axis(tmp_path):
    path, _ = _save_hf_dataset(tmp_path, grayscale=True, labels=False)
    dl = build_dataloader({"name": path, "batch_size": 4, "shuffle": False}, mode="train")
    assert next(iter(dl))["image"].shape == (4, 12, 12, 1)


def test_hf_dataset_bad_column_name_fails_loudly(tmp_path):
    path, _ = _save_hf_dataset(tmp_path, column="picture", labels=False)
    with pytest.raises(ValueError, match="did not match dataset columns"):
        build_dataloader({"name": path, "batch_size": 2}, mode="train")
