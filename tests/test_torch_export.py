"""Reference-checkpoint exporter (utils/torch_import.py export_unet_state_dict
+ tools/export_torch_checkpoint.py) — the inverse migration path.

Anchors:
  1. Algebraic round trips are BITWISE: import(export(flax)) == flax and
     export(import(torch)) == torch (every transform has an exact inverse).
  2. The exported state_dict actually loads into a reference-layout torch
     module (strict load, no missing/unexpected keys) and reproduces our
     network's forward outputs — key spelling AND math.
  3. CLI: .dmn archive -> state_dict.pt -> convert back == archive params.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_model_nemo_tpu.utils.torch_import import (
    convert_unet_state_dict,
    export_unet_state_dict,
)
from tests.test_torch_import import IMG, RUnet, _our_unet

REPO = Path(__file__).resolve().parents[1]


def _template(use_convnext=False, num_classes=None, seed=0):
    net = _our_unet(use_convnext=use_convnext, num_classes=num_classes)
    args = (jnp.zeros((1, IMG, IMG, 1)), jnp.zeros((1,)))
    kwargs = {}
    if num_classes is not None:
        kwargs["classes"] = jnp.zeros((1,), jnp.int32)
    return net, net.init(jax.random.PRNGKey(seed), *args, **kwargs)["params"]


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("use_convnext,num_classes", [(False, None), (True, None), (False, 3)])
def test_import_export_roundtrips_bitwise(use_convnext, num_classes):
    _net, params = _template(use_convnext=use_convnext, num_classes=num_classes)
    state = export_unet_state_dict(params, use_convnext=use_convnext)
    back = convert_unet_state_dict(state, params, use_convnext=use_convnext)
    _tree_equal(back, params)

    # torch-side identity too
    torch.manual_seed(0)
    tnet = RUnet(use_convnext=use_convnext, num_classes=num_classes)
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    imported = convert_unet_state_dict(sd, params, use_convnext=use_convnext)
    exported = export_unet_state_dict(imported, use_convnext=use_convnext)
    assert set(exported) == set(sd)
    for k in sd:
        assert np.array_equal(exported[k], np.asarray(sd[k], np.float32)), k


def test_export_loads_into_reference_layout_and_forward_matches():
    net, params = _template(seed=3)
    state = export_unet_state_dict(params)
    tnet = RUnet(use_convnext=False).eval()
    # strict load: no missing, no unexpected — the key spelling is the API
    tnet.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()}, strict=True)

    x = np.random.default_rng(5).normal(size=(2, IMG, IMG, 1)).astype(np.float32)
    t = np.asarray([2.0, 6.0], np.float32)
    with torch.no_grad():
        ty = tnet(torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(t)).numpy()
    jy = np.asarray(net.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(jy, np.moveaxis(ty, 1, -1), atol=2e-4)


def test_export_prefix_and_error_surface():
    _net, params = _template()
    state = export_unet_state_dict(params, prefix="diffusion_model.")
    assert all(k.startswith("diffusion_model.") for k in state)
    with pytest.raises(ValueError, match="export failed"):
        export_unet_state_dict({"bogus_head": {"kernel": np.zeros((1, 1, 1, 1))}})


@pytest.mark.slow
def test_cli_archive_to_state_dict_roundtrip(tmp_path):
    """.dmn -> export_torch_checkpoint.py -> torch.load -> convert back
    == archive params (and the npz format agrees)."""
    from diffusion_model_nemo_tpu.config import from_dict
    from diffusion_model_nemo_tpu.models import DDPM

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
                "use_convnext": False,
                "resnet_block_groups": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": 5,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
        }
    )
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(2))
    archive = tmp_path / "tiny.dmn"
    model.save_to(str(archive))

    out_pt = tmp_path / "state_dict.pt"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "export_torch_checkpoint.py"),
            "--archive", str(archive), "--output", str(out_pt),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    state = {k: v.numpy() for k, v in torch.load(out_pt, weights_only=True).items()}
    back = convert_unet_state_dict(state, model.params, use_convnext=False)
    _tree_equal(back, model.params)

    out_npz = tmp_path / "state_dict.npz"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "export_torch_checkpoint.py"),
            "--archive", str(archive), "--output", str(out_npz), "--format", "npz",
            "--ema",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    npz = np.load(out_npz)
    assert set(npz.files) == set(state)
