"""Post-hoc EMA: power-function averaging + after-the-fact profile synthesis
(Karras et al. 2024). Anchors: the closed-form profile inner product against
numerical quadrature, exact self-reconstruction (one-hot weights), and a
ground-truth reconstruction of a profile that was never tracked.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_model_nemo_tpu.training.posthoc_ema import (
    PostHocEMA,
    gamma_to_sigma_rel,
    list_snapshots,
    power_ema_update,
    profile_dot,
    reconstruct,
    sigma_rel_to_gamma,
    solve_posthoc_weights,
)


def test_sigma_rel_gamma_round_trip():
    # Paper-quoted anchors: sigma_rel 0.05 -> gamma ~= 16.97, 0.10 -> ~= 6.94.
    assert abs(sigma_rel_to_gamma(0.05) - 16.97) < 0.01
    assert abs(sigma_rel_to_gamma(0.10) - 6.94) < 0.01
    for s in (0.01, 0.05, 0.10, 0.20, 0.27):
        assert abs(gamma_to_sigma_rel(sigma_rel_to_gamma(s)) - s) < 1e-9
    # gamma=0 is the flat profile; wider is out of range.
    with pytest.raises(ValueError):
        sigma_rel_to_gamma(0.5)


def test_first_update_is_a_copy():
    params = {"w": jnp.full((3,), 2.5), "b": jnp.full((2,), -1.0)}
    state = {"w": jnp.zeros((3,)), "b": jnp.zeros((2,))}
    out = power_ema_update(state, params, gamma=7.0, t=jnp.asarray(1))
    # beta(1) = 0 exactly: the state is overwritten with params.
    assert np.array_equal(np.asarray(out["w"]), np.asarray(params["w"]))
    assert np.array_equal(np.asarray(out["b"]), np.asarray(params["b"]))


def test_constant_trajectory_is_a_fixed_point():
    params = {"w": jnp.full((4,), 3.25)}
    state = params
    for t in range(1, 60):
        state = power_ema_update(state, params, gamma=16.97, t=jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(state["w"]), 3.25, rtol=1e-6)


def test_profile_dot_matches_quadrature():
    # The closed form is the exact integral of the two normalized profiles
    # p(s) = (g+1) s^g / t^(g+1) over s in [0, min(ta, tb)].
    cases = [(100.0, 6.94, 250.0, 16.97), (64.0, 2.0, 64.0, 5.0), (500.0, 16.97, 90.0, 6.94)]
    for ta, ga, tb, gb in cases:
        hi = min(ta, tb)
        s = np.linspace(0.0, hi, 2_000_001)
        pa = (ga + 1.0) * s ** ga / ta ** (ga + 1.0)
        pb = (gb + 1.0) * s ** gb / tb ** (gb + 1.0)
        num = np.trapezoid(pa * pb, s)
        closed = profile_dot(ta, ga, tb, gb)
        assert abs(closed - num) / num < 1e-3, (ta, ga, tb, gb)


def _simulate(T, gammas, snapshot_every, seed=0):
    """Scalar random-walk parameter trajectory; returns (tracked final states,
    snapshots [(gamma, t, value)], the full trajectory)."""
    rng = np.random.default_rng(seed)
    theta = np.cumsum(rng.normal(size=T)).astype(np.float64)
    states = {g: None for g in gammas}
    snaps = []
    for i in range(T):
        t = i + 1
        for g in gammas:
            beta = 0.0 if t == 1 else (1.0 - 1.0 / t) ** (g + 1.0)
            prev = theta[0] if states[g] is None else states[g]
            states[g] = prev * beta + theta[i] * (1.0 - beta)
        if t % snapshot_every == 0:
            for g in gammas:
                snaps.append((g, t, states[g]))
    return states, snaps, theta


def test_exact_self_reconstruction_weights():
    # When the target profile (gamma_r, t_r) is itself among the snapshots,
    # the least-squares weights are exactly one-hot on it.
    gammas, T = (6.94, 16.97), 128
    _, snaps, _ = _simulate(T, gammas, snapshot_every=16)
    ts = [t for (_, t, _) in snaps]
    gs = [g for (g, _, _) in snaps]
    w = solve_posthoc_weights(ts, gs, T, 16.97)
    idx = [i for i, (g, t, _) in enumerate(snaps) if g == 16.97 and t == T][0]
    expect = np.zeros(len(snaps))
    expect[idx] = 1.0
    np.testing.assert_allclose(w, expect, atol=1e-7)


def test_ground_truth_reconstruction_of_untracked_profile():
    # Track sigma_rel {0.05, 0.10}; reconstruct sigma_rel 0.08 (never
    # tracked) and compare against running that profile directly over the
    # full trajectory. The profiles are continuous-time approximations of
    # the discrete update, so exactness improves with T; at T=512 with 16
    # snapshot times the reconstruction lands within a tight relative error
    # of the trajectory's scale.
    g_tracked = (sigma_rel_to_gamma(0.05), sigma_rel_to_gamma(0.10))
    g_target = sigma_rel_to_gamma(0.08)
    T = 512
    _, snaps, theta = _simulate(T, g_tracked + (g_target,), snapshot_every=32)
    truth = [v for (g, t, v) in snaps if g == g_target and t == T][0]
    used = [(g, t, v) for (g, t, v) in snaps if g != g_target]
    w = solve_posthoc_weights([t for _, t, _ in used], [g for g, _, _ in used], T, g_target)
    recon = float(np.dot(w, [v for _, _, v in used]))
    scale = np.std(theta)
    assert abs(recon - truth) / scale < 2e-3, (recon, truth, scale)


def test_posthoc_ema_class_snapshot_and_reconstruct(tmp_path):
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (4, 4)), "b": jnp.zeros((4,))}
    ph = PostHocEMA(tmp_path / "phema", sigma_rels=(0.05, 0.10), every_n_steps=4)
    state = ph.init_state(params)
    upd = ph.jitted_update()
    for i in range(8):
        params = {"w": params["w"] + 0.1, "b": params["b"] - 0.05}
        state = upd(state, params, jnp.asarray(i + 1))
        ph.maybe_snapshot(state, i + 1)
    snaps = list_snapshots(tmp_path / "phema")
    assert [t for _, t, _ in snaps] == [4, 4, 8, 8]
    assert {round(g, 4) for g, _, _ in snaps} == {round(g, 4) for g in ph.gammas}
    # Self-reconstruction of a tracked profile == the live state (one-hot).
    rec = reconstruct(tmp_path / "phema", sigma_rel=0.05, t=8)
    np.testing.assert_allclose(rec["w"], np.asarray(state[0]["w"]), rtol=1e-6)
    # An untracked profile reconstructs to the tracked ones' convex hull
    # neighborhood: finite, same structure.
    rec2 = reconstruct(tmp_path / "phema", sigma_rel=0.08)
    assert rec2["w"].shape == (4, 4) and np.all(np.isfinite(rec2["w"]))
    with pytest.raises(ValueError):
        reconstruct(tmp_path / "phema")  # must pick a profile


@pytest.mark.slow
def test_trainer_integration_and_cli(tmp_path):
    from test_training_e2e import tiny_ddpm_cfg
    from diffusion_model_nemo_tpu.models import DDPM
    from diffusion_model_nemo_tpu.training import Trainer

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    phema_dir = tmp_path / "phema"
    trainer = Trainer(
        devices=-1,
        max_steps=6,
        log_every_n_steps=2,
        posthoc_ema_sigma_rels=[0.05, 0.10],
        posthoc_ema_every_n_steps=4,
        posthoc_ema_dir=str(phema_dir),
    )
    trainer.fit(model)

    snaps = list_snapshots(phema_dir)
    assert [t for _, t, _ in snaps] == [4, 4, 6, 6]  # cadence + final-step capture
    rec = reconstruct(phema_dir, sigma_rel=0.07)
    assert jax.tree.structure(rec) == jax.tree.structure(
        jax.tree.map(np.asarray, model.params)
    )

    # CLI: reconstruction lands in a stock archive every surface can consume.
    import subprocess, sys
    from pathlib import Path

    archive = tmp_path / "base.dmn"
    model.save_to(str(archive))
    out = tmp_path / "rec.dmn"
    r = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parents[1] / "tools" / "reconstruct_ema.py"),
         "--archive", str(archive), "--snapshots", str(phema_dir),
         "--sigma_rel", "0.07", "--output", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from diffusion_model_nemo_tpu.training.checkpoints import load_archive

    _, params2, ema2, _ = load_archive(str(out))
    assert ema2 is not None
    np.testing.assert_allclose(
        jax.tree.leaves(ema2)[0], jax.tree.leaves(rec)[0], rtol=1e-6
    )
