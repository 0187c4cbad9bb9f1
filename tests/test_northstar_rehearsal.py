"""North-star pipeline rehearsal on the offline ``file`` dataset (VERDICT r2
item 7): the EXACT command sequence that will produce the BASELINE.md
artifacts (loss curve + FID) the day real data / Inception weights are
mounted, green in CI today.

Flow: deterministic image-dir fixture → ``train_ddpm.py train_ds.name=file``
(real-data loss curve written to TB/exp dir) → ``compute_fid.py`` on the
archive with the (labeled) random-weight Inception extractor → sanity
ordering FID(real, real) ≈ 0 < FID(real, generated).
"""

import json
import os
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess train + 2×FID feature passes

REPO = Path(__file__).resolve().parents[1]
IMG = 8


def _run(script, *overrides, timeout=900):
    env = dict(os.environ)
    env["DMN_TPU_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *overrides],
        cwd=str((REPO / "examples" / script).parent),
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed rc={proc.returncode}\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """64 deterministic 8x8 PNGs — stands in for the mounted real dataset."""
    from PIL import Image

    d = tmp_path_factory.mktemp("real_images")
    rng = np.random.RandomState(0)
    # structured, not pure noise: blobs with per-image offsets so the model
    # has something to fit and FID(real, gen) has signal
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    for i in range(64):
        cx, cy = rng.uniform(2, 6, size=2)
        img = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 4.0)
        img = (img * 255).astype(np.uint8)
        Image.fromarray(np.stack([img] * 3, -1)).save(d / f"img_{i:03d}.png")
    return d


def test_file_train_then_fid_rehearsal(tmp_path, image_dir):
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        f"model.image_size={IMG}",
        "model.channels=3",
        "model.timesteps=10",
        "model.save_every=0",
        "model.train_ds.name=file",
        f"+model.train_ds.path={image_dir}",
        "model.train_ds.batch_size=16",
        "model.diffusion_model.dim=8",
        "model.diffusion_model.dim_mults=[1,2]",
        "trainer.max_steps=3",
        "trainer.log_every_n_steps=1",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=NorthStar",
    )
    archives = list(exp.glob("NorthStar/*/NorthStar.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"
    # the loss curve artifact the BASELINE comparison will read
    assert list(exp.glob("NorthStar/*/tensorboard/events.out.tfevents.*")), "no TB loss curve"

    proc = _run(
        "ddpm/compute_fid.py",
        f"model_path={archives[0]}",
        "dataset_name=file",
        f"dataset_path={image_dir}",
        "num_samples=32",
        "batch_size=16",
        "use_ddim_sampler=true",
        "ddim_timesteps=5",
        "compute_kid=true",
        "compute_is=true",
        "is_splits=2",
    )
    m = re.search(r"FID: ([0-9.]+) \[(.*)\]", proc.stdout)
    assert m, f"no FID line in output:\n{proc.stdout[-2000:]}"
    fid_gen = float(m.group(1))
    assert "RANDOM weights" in m.group(2), "extractor label must disclose weights"
    # companion metrics ride the same trunk pass (metrics/scores.py)
    mk = re.search(r"KID: (-?[0-9.]+) \+/- ([0-9.]+)", proc.stdout)
    assert mk, f"no KID line in output:\n{proc.stdout[-2000:]}"
    mi = re.search(r"IS: ([0-9.]+) \+/- ([0-9.]+)", proc.stdout)
    assert mi, f"no IS line in output:\n{proc.stdout[-2000:]}"
    assert float(mi.group(1)) >= 1.0, "IS is bounded below by 1"

    # FID(real, real) with the same extractor — must be ~0 and strictly below
    # the 3-step-trained model's FID.
    sys.path.insert(0, str(REPO))
    os.environ["DMN_TPU_PLATFORM"] = "cpu"
    from diffusion_model_nemo_tpu.data import build_dataloader
    from diffusion_model_nemo_tpu.metrics import FIDScorer, inception_feature_fn

    dl = build_dataloader(
        {"name": "file", "path": str(image_dir), "batch_size": 16, "shuffle": False},
        mode="test",
    )
    feature_fn = inception_feature_fn(weights_path=None, batch_size=16)
    scorer = FIDScorer(feature_fn=feature_fn)
    for batch in dl:
        scorer.update_real(batch["image"])
        scorer.update_generated(batch["image"])
    fid_real = scorer.compute()

    assert fid_real < 1e-3, f"FID(real, real) should be ~0, got {fid_real}"
    assert fid_gen > fid_real + 0.1, (
        f"FID(real, gen)={fid_gen} not separated from FID(real, real)={fid_real}"
    )
