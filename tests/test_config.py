"""Config system: YAML load, interpolation, overrides, _target_ instantiate."""

import pytest

from diffusion_model_nemo_tpu.config import (
    apply_overrides,
    from_dict,
    instantiate,
    load_config,
    resolve_interpolations,
    to_yaml,
)


def test_interpolation_resolves_types():
    cfg = from_dict(
        {
            "model": {"image_size": 32, "net": {"input_dim": "${model.image_size}"}},
            "name": "x-${model.image_size}",
        }
    )
    out = resolve_interpolations(cfg)
    assert out.model.net.input_dim == 32  # whole-string keeps int type
    assert out.name == "x-32"


def test_overrides_dotted_and_new_keys():
    cfg = from_dict({"a": {"b": 1}, "c": "keep"})
    out = apply_overrides(cfg, ["a.b=5", "+a.new=[1,2]", "c=null"])
    assert out.a.b == 5
    assert out.a.new == [1, 2]
    assert out.c is None
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["missing.key=1"])


def test_instantiate_reference_target_names():
    gd = instantiate(
        {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
        }
    )
    assert gd.timesteps == 10
    loss = instantiate(
        {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"}
    )
    assert loss.loss_type == "l2"


def test_reference_ddpm_yaml_loads():
    """Our shipped config keeps the reference's public surface."""
    cfg = load_config("examples/configs/ddpm/unet_small.yaml", overrides=["model.image_size=32"])
    assert cfg.model.diffusion_model.input_dim == 32
    assert cfg.model.sampler.timesteps == 1000
    sampler = instantiate(cfg.model.sampler)
    assert sampler.timesteps == 1000
    assert sampler.schedule_name == "cosine"


def test_yaml_roundtrip():
    cfg = from_dict({"x": [1, 2], "y": {"z": None}})
    import yaml

    again = yaml.safe_load(to_yaml(cfg))
    assert again == {"x": [1, 2], "y": {"z": None}}
