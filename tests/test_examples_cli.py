"""Example-script plumbing: the hydra_runner surface (config path resolution,
overrides, dataclass schemas)."""

import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # subprocess e2e drives dominate suite wall-clock

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "examples"))

from common import hydra_runner  # noqa: E402


def test_hydra_runner_yaml_and_overrides(tmp_path, monkeypatch):
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    (cfg_dir / "c.yaml").write_text("a: 1\nb:\n  c: ${a}\n")

    captured = {}

    @hydra_runner(config_path=str(cfg_dir), config_name="c.yaml")
    def main(cfg):
        captured.update(cfg)

    monkeypatch.setattr(sys, "argv", ["prog", "a=5"])
    main()
    assert captured["a"] == 5
    assert captured["b"]["c"] == 5  # interpolation resolves post-override


def test_hydra_runner_dataclass_schema(monkeypatch):
    from dataclasses import dataclass

    @dataclass
    class S:
        x: int = 3
        name: str = "d"

    captured = {}

    @hydra_runner(config_path=None, config_name="S", schema=S)
    def main(cfg):
        captured.update(cfg)

    monkeypatch.setattr(sys, "argv", ["prog", "x=9"])
    main()
    assert captured["x"] == 9 and captured["name"] == "d"


def test_hydra_runner_config_path_flags(tmp_path, monkeypatch):
    cfg_dir = tmp_path / "alt"
    cfg_dir.mkdir()
    (cfg_dir / "alt.yaml").write_text("v: 1\n")

    captured = {}

    @hydra_runner(config_path="/nonexistent", config_name="none.yaml")
    def main(cfg):
        captured.update(cfg)

    monkeypatch.setattr(
        sys, "argv", ["prog", f"--config-path={cfg_dir}", "--config-name=alt.yaml", "v=2"]
    )
    main()
    assert captured["v"] == 2


@pytest.mark.parametrize(
    "script",
    [
        "ddpm/train_ddpm.py",
        "improved_ddpm/train_ddpm.py",
        "conditional_ddpm/train_conditional_ddpm.py",
        "score_sde/train_score_sde.py",
        "wavegrad_ddpm/train_wavegrad_ddpm.py",
        "ddpm/eval_ddpm.py",
        "ddpm/compute_fid.py",
    ],
)
def test_scripts_importable(script):
    """All example scripts at least parse (no import-time syntax errors)."""
    path = REPO / "examples" / script
    compile(path.read_text(), str(path), "exec")
