"""Drive the example CLIs end-to-end in subprocesses (VERDICT r1 #5).

The reference's user surface is its example scripts
(/root/reference/examples/ddpm/train_ddpm.py:64-75: build trainer + model,
fit, save archive); these tests exercise the same flow CI-runnably on the
virtual CPU backend (DMN_TPU_PLATFORM=cpu, honored by examples/common.py):
train → .dmn archive → eval round trip, plus one score-SDE and one WaveGrad
vocoder run.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # subprocess e2e drives dominate suite wall-clock

REPO = Path(__file__).resolve().parents[1]


def _run(script: str, *overrides: str, timeout: int = 600):
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


TINY_TRAIN = [
    "model.image_size=8",
    "model.channels=1",
    "model.timesteps=10",
    "model.save_every=0",
    "model.train_ds.name=synthetic",
    "+model.train_ds.image_size=8",
    "+model.train_ds.channels=1",
    "+model.train_ds.length=32",
    "model.train_ds.batch_size=8",
    "model.diffusion_model.dim=8",
    "model.diffusion_model.dim_mults=[1,2]",
    "trainer.max_steps=2",
    "trainer.log_every_n_steps=1",
]


def test_train_then_eval_ddpm_roundtrip(tmp_path):
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliDDPM",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliDDPM/*/CliDDPM.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"

    out = tmp_path / "samples"
    _run(
        "ddpm/eval_ddpm.py",
        f"model_path={archives[0]}",
        "batch_size=4",
        "use_ddim_sampler=true",
        "ddim_timesteps=5",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()
    assert len(list(out.glob("sample_*.png"))) == 4


def test_train_score_sde_cli(tmp_path):
    _run(
        "score_sde/train_score_sde.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={tmp_path / 'exp'}",
        "exp_manager.name=CliSDE",
        f"+model.results_dir={tmp_path / 'results'}",
    )


def test_train_wavegrad_cli(tmp_path):
    _run(
        "wavegrad_ddpm/train_wavegrad_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={tmp_path / 'exp'}",
        "exp_manager.name=CliWG",
        f"+model.results_dir={tmp_path / 'results'}",
    )


def test_distill_cli_roundtrip(tmp_path):
    """train → distill (eps→v transfer + one halving) → eval the student
    archive with its persisted few-step DDIM sampler."""
    exp = tmp_path / "exp"
    train = [o if not o.startswith("model.timesteps") else "model.timesteps=16" for o in TINY_TRAIN]
    _run(
        "ddpm/train_ddpm.py",
        *train,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliTeacher",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliTeacher/*/CliTeacher.dmn"))
    assert len(archives) == 1

    student = tmp_path / "Student.dmn"
    _run(
        "ddpm/distill_ddpm.py",
        f"model_path={archives[0]}",
        f"output_path={student}",
        "final_steps=4",
        "steps_per_phase=2",
        "transfer_steps=2",
        "batch_size=8",
        "dataset_name=synthetic",
        "dataset_length=16",
        "log_every=1",
    )
    assert student.exists()

    out = tmp_path / "samples"
    _run(
        "ddpm/eval_ddpm.py",
        f"model_path={student}",
        "batch_size=2",
        "use_ddim_sampler=false",  # keep the archive's own distilled sampler
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()


def test_consistency_cli_roundtrip(tmp_path):
    """train → consistency-distill → eval the student archive with its
    persisted 2-step consistency sampler."""
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliCDTeacher",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliCDTeacher/*/CliCDTeacher.dmn"))
    assert len(archives) == 1

    student = tmp_path / "StudentCD.dmn"
    _run(
        "ddpm/consistency_ddpm.py",
        f"model_path={archives[0]}",
        f"output_path={student}",
        "steps=2",
        "grid_steps=4",
        "sample_steps=2",
        "batch_size=8",
        "dataset_name=synthetic",
        "dataset_length=32",
        "log_every=1",
    )
    assert student.exists()

    out = tmp_path / "samples_cd"
    _run(
        "ddpm/eval_ddpm.py",
        f"model_path={student}",
        "batch_size=2",
        "use_ddim_sampler=false",  # keep the archive's consistency sampler
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()


def test_train_then_eval_rectified_flow_roundtrip(tmp_path):
    exp = tmp_path / "exp"
    _run(
        "rectified_flow/train_rectified_flow.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliRF",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliRF/*/CliRF.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"

    out = tmp_path / "samples"
    _run(
        "rectified_flow/eval_rectified_flow.py",
        f"model_path={archives[0]}",
        "batch_size=4",
        "num_steps=4",
        "solver=heun",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()
    assert len(list(out.glob("sample_*.png"))) == 4


def test_rectified_flow_nll_test_cli(tmp_path):
    """train → test_rectified_flow.py: exact change-of-variables NLL CLI."""
    exp = tmp_path / "exp"
    _run(
        "rectified_flow/train_rectified_flow.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliRFN",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliRFN/*/CliRFN.dmn"))
    assert len(archives) == 1
    proc = _run(
        "rectified_flow/test_rectified_flow.py",
        f"model_path={archives[0]}",
        "dataset_name=synthetic",
        "batch_size=8",
        "limit_test_batches=1",
    )
    blob = proc.stdout + proc.stderr
    assert "test_total_bpd" in blob and "test_fm_loss" in blob


def test_train_then_eval_edm_roundtrip(tmp_path):
    """EDM family: train → churned Heun eval from the archive."""
    exp = tmp_path / "exp"
    _run(
        "edm/train_edm.py",
        *[o if not o.startswith("model.timesteps") else "model.timesteps=4" for o in TINY_TRAIN],
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliEDM",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliEDM/*/CliEDM.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"

    out = tmp_path / "samples"
    _run(
        "edm/eval_edm.py",
        f"model_path={archives[0]}",
        "batch_size=4",
        "num_steps=3",
        "s_churn=1.0",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()
    assert len(list(out.glob("sample_*.png"))) == 4


def test_conditional_edm_train_guided_eval_and_nll(tmp_path):
    """Conditional EDM: num_classes selects the conditional family; guided
    eval (label + guidance_scale) and the test CLI's conditional NLL both
    run from the archive."""
    exp = tmp_path / "exp"
    _run(
        "edm/train_edm.py",
        *[o if not o.startswith("model.timesteps") else "model.timesteps=4" for o in TINY_TRAIN],
        "model.num_classes=3",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliCEDM",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliCEDM/*/CliCEDM.dmn"))
    assert len(archives) == 1

    out = tmp_path / "samples"
    _run(
        "edm/eval_edm.py",
        f"model_path={archives[0]}",
        "batch_size=2",
        "num_steps=3",
        "label=1",
        "guidance_scale=2.0",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()

    proc = _run(
        "edm/test_edm.py",
        f"model_path={archives[0]}",
        "dataset_name=synthetic",
        "batch_size=4",
        "limit_test_batches=1",
    )
    blob = proc.stdout + proc.stderr
    assert "test_total_bpd" in blob and "test_edm_loss" in blob


def test_train_then_eval_sr3_roundtrip(tmp_path):
    """SR3 family: train → degrade+super-resolve eval with PSNR report."""
    exp = tmp_path / "exp"
    _run(
        "sr3/train_sr3.py",
        *TINY_TRAIN,
        "model.scale_factor=2",
        "model.compute_bpd=false",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliSR3",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliSR3/*/CliSR3.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"

    out = tmp_path / "sr"
    proc = _run(
        "sr3/eval_sr3.py",
        f"model_path={archives[0]}",
        "dataset_name=synthetic",
        "batch_size=4",
        "use_ddim_sampler=true",
        "ddim_timesteps=4",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert "PSNR vs ground truth" in (proc.stdout + proc.stderr)
    assert (out / "sr.png").exists() and (out / "hr.png").exists()


def test_inpaint_cli_from_ddpm_archive(tmp_path):
    """RePaint CLI: train a tiny DDPM, then self-inpaint with a center mask."""
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliInp",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    archives = list(exp.glob("CliInp/*/CliInp.dmn"))
    assert len(archives) == 1

    out = tmp_path / "inpainted"
    _run(
        "ddpm/inpaint_ddpm.py",
        f"model_path={archives[0]}",
        "batch_size=2",
        "mask=center",
        "jump_length=3",
        "jump_n_sample=2",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    for name in ("input.png", "masked.png", "inpainted.png"):
        assert (out / name).exists()

    # SDEdit CLI from the same archive: self-edit at strength 0.5
    edited = tmp_path / "edited"
    _run(
        "ddpm/edit_ddpm.py",
        f"model_path={archives[0]}",
        "batch_size=2",
        "strength=0.5",
        f"output_dir={edited}",
        "add_timestamp=false",
    )
    for name in ("input.png", "edited.png"):
        assert (edited / name).exists()


def test_latent_diffusion_cli_roundtrip(tmp_path):
    """Latent family: train the KL-AE first stage → train a latent DDPM on
    its archive (with scale-factor calibration) → eval the self-contained
    LDM archive via latent DDIM."""
    exp = tmp_path / "exp"
    _run(
        "latent_diffusion/train_autoencoder_kl.py",
        "model.image_size=16",
        "model.channels=1",
        "model.save_every=0",
        "model.train_ds.name=synthetic",
        "+model.train_ds.image_size=16",
        "+model.train_ds.channels=1",
        "+model.train_ds.length=32",
        "model.train_ds.batch_size=8",
        "model.diffusion_model.dim=8",
        "model.diffusion_model.dim_mults=[1,2]",
        "model.diffusion_model.z_channels=2",
        "model.diffusion_model.resnet_block_groups=4",
        "model.diffusion_model.dtype=float32",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliAE",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    ae = list(exp.glob("CliAE/*/CliAE.dmn"))
    assert len(ae) == 1, f"AE archive not produced under {exp}"

    _run(
        "latent_diffusion/train_latent_ddpm.py",
        "model.image_size=16",
        "model.channels=1",
        "model.timesteps=8",
        "model.save_every=0",
        f"model.first_stage.restore_from={ae[0]}",
        "model.train_ds.name=synthetic",
        "+model.train_ds.image_size=16",
        "+model.train_ds.channels=1",
        "+model.train_ds.length=32",
        "model.train_ds.batch_size=8",
        "model.diffusion_model.input_dim=8",
        "model.diffusion_model.dim=8",
        "model.diffusion_model.dim_mults=[1,2]",
        "model.diffusion_model.channels=2",
        "model.diffusion_model.resnet_block_groups=4",
        "model.diffusion_model.dtype=float32",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliLDM",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    ldm = list(exp.glob("CliLDM/*/CliLDM.dmn"))
    assert len(ldm) == 1, f"LDM archive not produced under {exp}"

    out = tmp_path / "samples"
    _run(
        "latent_diffusion/eval_latent_ddpm.py",
        f"model_path={ldm[0]}",
        "batch_size=4",
        "use_ddim_sampler=true",
        "ddim_timesteps=4",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()
    assert len(list(out.glob("sample_*.png"))) == 4


def test_cascade_cli_roundtrip(tmp_path):
    """Cascaded generation CLI: base DDPM@8 + SR3@16 (cond-aug) → 16px
    samples with per-stage grids (pipelines/cascade.py key-stream contract
    is unit-tested in tests/test_cascade.py; this drives the user surface)."""
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliCascBase",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    base = list(exp.glob("CliCascBase/*/CliCascBase.dmn"))
    assert len(base) == 1

    sr_train = [o.replace("=8", "=16") if "image_size" in o else o for o in TINY_TRAIN]
    _run(
        "sr3/train_sr3.py",
        *sr_train,
        "model.scale_factor=2",
        "model.compute_bpd=false",
        "+model.cond_aug_std=0.1",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliCascSR",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    sr = list(exp.glob("CliCascSR/*/CliCascSR.dmn"))
    assert len(sr) == 1

    out = tmp_path / "cascade"
    proc = _run(
        "sr3/cascade_sr3.py",
        f"base_path={base[0]}",
        f"upscaler_paths={sr[0]}",
        "batch_size=4",
        "seed=0",
        "use_ddim_sampler=true",
        "ddim_timesteps=4",
        "upscaler_ddim_timesteps=4",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert "8 → 16 px" in (proc.stdout + proc.stderr)
    assert (out / "samples_grid.png").exists()
    assert (out / "stage0_8px.png").exists() and (out / "stage1_16px.png").exists()
    assert len(list(out.glob("sample_*.png"))) == 4


def test_lora_finetune_cli_roundtrip(tmp_path):
    """LoRA CLI: train a tiny DDPM → finetune_lora.py (merged archive +
    adapter .npz) → the merged archive samples via the stock eval CLI."""
    exp = tmp_path / "exp"
    _run(
        "ddpm/train_ddpm.py",
        *TINY_TRAIN,
        f"exp_manager.exp_dir={exp}",
        "exp_manager.name=CliLoraBase",
        f"+model.results_dir={tmp_path / 'results'}",
    )
    base = list(exp.glob("CliLoraBase/*/CliLoraBase.dmn"))
    assert len(base) == 1

    merged = tmp_path / "lora.dmn"
    adapters = tmp_path / "adapters.npz"
    proc = _run(
        "ddpm/finetune_lora.py",
        f"model_path={base[0]}",
        f"output_path={merged}",
        f"adapters_path={adapters}",
        "rank=4",
        "steps=6",
        "batch_size=8",
        "dataset_name=synthetic",
        "dataset_length=16",
        "log_every=2",
    )
    blob = proc.stdout + proc.stderr
    assert "trainable params" in blob and "LoRA loss" in blob
    assert merged.exists() and adapters.exists()
    # adapters are tiny relative to the archive
    assert adapters.stat().st_size < merged.stat().st_size

    out = tmp_path / "samples"
    _run(
        "ddpm/eval_ddpm.py",
        f"model_path={merged}",
        "batch_size=4",
        "use_ddim_sampler=true",
        "ddim_timesteps=4",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()


def test_train_then_eval_dit_roundtrip(tmp_path):
    """DiT-backbone CLI: train_dit.py (MoE variant under expert_parallel) ->
    archive -> stock eval_ddpm.py DDIM eval (the backbone is invisible to
    samplers/archives)."""
    exp = tmp_path / "exp"
    _run(
        "dit/train_dit.py",
        "model.image_size=8",
        "model.timesteps=10",
        "model.save_every=0",
        "model.compute_bpd=false",
        "model.train_ds.name=synthetic",
        "+model.train_ds.image_size=8",
        "+model.train_ds.length=32",
        "model.train_ds.batch_size=8",
        "model.diffusion_model.dim=64",
        "model.diffusion_model.depth=2",
        "model.diffusion_model.heads=4",
        "model.diffusion_model.dtype=float32",
        "model.diffusion_model.moe_experts=2",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        "trainer.strategy=expert_parallel",
        "trainer.tp_size=2",
        f"exp_manager.exp_dir={exp}",
        "exp_manager.create_tensorboard_logger=false",
    )
    archives = list(exp.glob("DDPM-DiT/*/DDPM-DiT.dmn"))
    assert len(archives) == 1, f"archive not produced under {exp}"

    out = tmp_path / "samples"
    _run(
        "ddpm/eval_ddpm.py",
        f"model_path={archives[0]}",
        "batch_size=4",
        "use_ddim_sampler=true",
        "ddim_timesteps=5",
        f"output_dir={out}",
        "add_timestamp=false",
    )
    assert (out / "samples_grid.png").exists()
