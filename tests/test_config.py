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


def test_scientific_notation_floats_parse_as_float(tmp_path):
    """pyyaml (YAML 1.1) reads `1e-5` as a string; our loader must not —
    the reference YAML uses bare scientific notation (min_lr: 1e-4)."""
    p = tmp_path / "c.yaml"
    p.write_text("eps: 1e-5\nmin_lr: 1e-4\nplain: 1.0e-3\nn: 17\nname: x\n")
    cfg = load_config(p)
    assert isinstance(cfg.eps, float) and cfg.eps == 1e-5
    assert isinstance(cfg.min_lr, float)
    assert cfg.plain == 1e-3
    assert isinstance(cfg.n, int)
    assert cfg.name == "x"
    # dotted overrides too
    out = apply_overrides(cfg, ["eps=5e-6"])
    assert isinstance(out.eps, float) and out.eps == 5e-6
