"""Local model hub (utils/hub.py + from_pretrained/list_available_models).

The reference's ``from_pretrained`` falls back to NeMo's NGC hub and its
``list_available_models`` returns None (no published checkpoints, reference
abstract_diffusion_model.py:127-128). This build implements the same
discovery surface against a LOCAL directory of .dmn archives
($DMN_MODEL_HUB) — publish → list → restore-by-name round trip, name
resolution for every archive-taking CLI path, loud unknown-name failure.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM, restore_model_from_archive
from diffusion_model_nemo_tpu.utils import hub as hub_lib

IMG = 8


def _tiny_model():
    cfg = from_dict(
        {
            "image_size": IMG,
            "timesteps": 5,
            "channels": 1,
            "save_every": 0,
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.Unet",
                "input_dim": IMG,
                "dim": 8,
                "channels": 1,
                "dim_mults": [1, 2],
                "resnet_block_groups": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": 5,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )
    m = DDPM(cfg=cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.fixture
def hub(tmp_path, monkeypatch):
    monkeypatch.setenv("DMN_MODEL_HUB", str(tmp_path / "hub"))
    return tmp_path / "hub"


def test_publish_list_restore_round_trip(hub):
    model = _tiny_model()
    assert DDPM.list_available_models() is None  # empty hub == reference

    loc = model.publish_to_hub("tiny_ddpm")
    assert loc == str(hub / "tiny_ddpm.dmn")

    infos = DDPM.list_available_models()
    assert [m.pretrained_model_name for m in infos] == ["tiny_ddpm"]

    restored = DDPM.from_pretrained("tiny_ddpm")
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_model_directory_layout(hub):
    model = _tiny_model()
    d = hub / "nested_ddpm"
    d.mkdir(parents=True)
    model.save_to(str(d / "nested_ddpm.dmn"))
    assert hub_lib.resolve_model_name("nested_ddpm") == d / "nested_ddpm.dmn"
    assert DDPM.from_pretrained("nested_ddpm").image_size == IMG
    # stray archives in mismatched subdirectories are NOT models
    other = hub / "somedir"
    other.mkdir()
    model.save_to(str(other / "different_name.dmn"))
    names = [m.pretrained_model_name for m in hub_lib.list_hub_models()]
    assert names == ["nested_ddpm"]


def test_generic_restore_accepts_hub_names(hub):
    """restore_model_from_archive — the entry every archive-taking CLI uses —
    resolves hub names, so `serve.py model_path=<name>` works."""
    model = _tiny_model()
    model.publish_to_hub("served_model")
    restored = restore_model_from_archive("served_model")
    assert isinstance(restored, DDPM)


def test_direct_path_still_wins(hub, tmp_path):
    model = _tiny_model()
    p = tmp_path / "direct.dmn"
    model.save_to(str(p))
    assert DDPM.from_pretrained(str(p)).image_size == IMG


def test_unknown_name_fails_loudly_listing_installed(hub):
    model = _tiny_model()
    model.publish_to_hub("only_model")
    with pytest.raises(FileNotFoundError, match="only_model"):
        DDPM.from_pretrained("no_such_model")


def test_publish_validates_names(hub, tmp_path):
    model = _tiny_model()
    p = tmp_path / "x.dmn"
    model.save_to(str(p))
    with pytest.raises(ValueError, match="name"):
        hub_lib.publish_archive(str(p), "../escape")
    with pytest.raises(FileNotFoundError):
        hub_lib.publish_archive(str(tmp_path / "missing.dmn"))
