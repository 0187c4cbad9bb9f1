"""FileVisionDataset (train_ds.name=file) + parallel host loading.

The zero-egress real-data path (VERDICT r1 #3): mounted npz/npy/image-dir
datasets drive training without HuggingFace hub access. The loader's
``num_workers`` thread pool (VERDICT r1 #4) must produce byte-identical
batches to the serial path and parallelize real decode work.
"""

import time

import numpy as np
import jax
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.data import DataLoader, FileVisionDataset, build_dataloader


def _write_npz(tmp_path, n=32, hw=8, c=3, labels=True, name="data.npz"):
    rng = np.random.RandomState(0)
    arrs = {"images": rng.randint(0, 256, size=(n, hw, hw, c), dtype=np.uint8)}
    if labels:
        arrs["labels"] = rng.randint(0, 10, size=(n,)).astype(np.int64)
    path = tmp_path / name
    np.savez(path, **arrs)
    return path, arrs


def test_npz_dataset_roundtrip(tmp_path):
    path, arrs = _write_npz(tmp_path)
    ds = FileVisionDataset(str(path))
    assert len(ds) == 32
    item = ds[3]
    np.testing.assert_array_equal(item["image"], arrs["images"][3])
    assert item["label"] == arrs["labels"][3] and item["label"].dtype == np.int32


def test_npz_nchw_and_float_normalization(tmp_path):
    rng = np.random.RandomState(1)
    imgs_u8 = rng.randint(0, 256, size=(4, 3, 16, 16), dtype=np.uint8)  # NCHW
    np.savez(tmp_path / "nchw.npz", images=imgs_u8)
    ds = FileVisionDataset(str(tmp_path / "nchw.npz"))
    np.testing.assert_array_equal(ds[0]["image"], np.transpose(imgs_u8[0], (1, 2, 0)))

    # [-1, 1] floats scale back to uint8
    f = imgs_u8.astype(np.float32).transpose(0, 2, 3, 1) / 127.5 - 1.0
    np.savez(tmp_path / "f.npz", images=f)
    ds2 = FileVisionDataset(str(tmp_path / "f.npz"))
    np.testing.assert_allclose(ds2[1]["image"], imgs_u8.transpose(0, 2, 3, 1)[1], atol=1)


def test_npy_dataset(tmp_path):
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, size=(8, 8, 8, 1), dtype=np.uint8)
    np.save(tmp_path / "imgs.npy", imgs)
    ds = FileVisionDataset(str(tmp_path / "imgs.npy"))
    assert len(ds) == 8 and "label" not in ds[0]
    np.testing.assert_array_equal(ds[5]["image"], imgs[5])


def test_image_directory_with_labels(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    d = tmp_path / "imgdir"
    d.mkdir()
    imgs = rng.randint(0, 256, size=(6, 16, 16, 3), dtype=np.uint8)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(d / f"{i:03d}.png")
    np.save(d / "labels.npy", np.arange(6))
    ds = FileVisionDataset(str(d))
    assert len(ds) == 6
    np.testing.assert_array_equal(ds[2]["image"], imgs[2])
    assert ds[2]["label"] == 2


def test_build_dataloader_file_and_num_workers_identical_batches(tmp_path):
    path, _ = _write_npz(tmp_path)
    base = {"name": "file", "path": str(path), "batch_size": 8, "shuffle": True, "seed": 7}
    serial = build_dataloader(from_dict({**base, "num_workers": 0}), mode="train")
    threaded = build_dataloader(
        from_dict({**base, "num_workers": 4, "pin_memory": True}), mode="train"
    )
    assert threaded.num_workers == 4
    for b0, b1 in zip(serial, threaded):
        np.testing.assert_array_equal(b0["image"], b1["image"])
        np.testing.assert_array_equal(b0["label"], b1["label"])


def test_parallel_loader_overlaps_slow_items(tmp_path):
    """Threads must overlap blocking per-item work (decode/IO analogue)."""

    class SlowDataset:
        def __len__(self):
            return 32

        def __getitem__(self, idx):
            time.sleep(0.01)  # stands in for PIL decode, which releases the GIL
            return {"image": np.full((4, 4, 1), idx % 256, np.uint8)}

    serial = DataLoader(SlowDataset(), batch_size=16, num_workers=0)
    par = DataLoader(SlowDataset(), batch_size=16, num_workers=8)
    t0 = time.perf_counter()
    list(serial)
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    batches = list(par)
    t_par = time.perf_counter() - t0
    assert len(batches) == 2
    assert t_par < t_serial * 0.6, f"parallel {t_par:.3f}s vs serial {t_serial:.3f}s"


@pytest.mark.slow
def test_ddpm_trains_from_file_dataset(tmp_path):
    path, _ = _write_npz(tmp_path, n=32, hw=8, c=1)
    from tests.test_training_e2e import tiny_ddpm_cfg
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.training import Trainer

    cfg = tiny_ddpm_cfg(tmp_path)
    cfg["train_ds"] = from_dict(
        {"name": "file", "path": str(path), "batch_size": 8, "num_workers": 2, "shuffle": True}
    )
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=-1, max_steps=2, log_every_n_steps=1)
    trainer.fit(model)
    assert trainer.global_step == 2
