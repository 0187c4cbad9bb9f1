"""The compact bench summary line must fit the driver's tail window.

BENCH_r04.json was rc=0 but ``parsed: null``: the single cumulative JSON
line outgrew the driver's 2000-char stdout tail and the headline ``value``
was truncated out. bench.py now prints a compact summary line LAST after
every leg; this test populates a state with EVERY leg (round-5 shape,
realistically-sized values) and pins the compact line well under the
window, with the headline and parity/budget numbers present.
"""

import json

import bench


def _full_state() -> dict:
    return {
        "metric": "CIFAR-10 32x32 samples/sec/chip, 1000-step DDPM (fused lax.scan sampler)",
        "value": 108.0982,
        "unit": "samples/sec/chip",
        "vs_baseline": 106.658,
        "batch": 128,
        "timesteps": 1000,
        "budget_s": 1500.0,
        "device_kind": "tpu v5 lite",
        "peak_bf16_flops": 197e12,
        "hbm_bw_bytes": 819e9,
        "device_init_s": 12.8,
        "mfu_pct": 26.63,
        "sol_pct": 26.63,
        "roofline_bound": "compute",
        "flops_per_forward": 62117609472.0,
        "bytes_per_forward": 2082680832.0,
        "topology": "Unet dim=32 dim_mults=[1,2,2,2]",
        "baseline": "reference-style per-step dispatch + host sync on same chip",
        "baseline_value": 1.0135,
        "parity": {"max_loss_delta": 1.55e-06, "max_param_delta": 0.000199,
                   "steps": 8, "wall_s": 41.2},
        "ref_topo": {"sps": 38.1234, "mfu_pct": 31.02, "sol_pct": 31.02,
                     "params": 35700000,
                     "topology": "Unet dim=32 dim_mults=[1,2,4,8] (reference unet_small.yaml)",
                     "wall_s": 55.1},
        "train": {"sps": 15941.3, "ms_per_step": 8.029, "mfu_est_pct": 11.78,
                  "scan10": {"sps": 31999.9, "ms_per_step": 4.001,
                             "mfu_est_pct": 23.64}, "wall_s": 51.5},
        "train_budget": {"us_per_step": {"fusion": 1200.4, "conv": 801.2,
                                         "custom-call": 460.8, "reduce": 410.1,
                                         "copy": 101.4, "rng": 55.2,
                                         "rest": 88.8, "device_total": 3118.0}},
        "bpd": {"bpd": 12.3456, "batch": 32, "T": 100, "images_per_sec": 51.2,
                "wall_s": 33.0},
        "step_budget": {"us_per_step": {"custom-call": 460.2, "reduce": 410.7,
                                        "fusion": 101.3, "conv": 87.2,
                                        "copy": 63.4, "rng": 30.1, "rest": 20.0,
                                        "device_total": 1172.9}, "wall_s": 44.1},
        "b256": {"sps": 111.2345, "mfu_pct": 27.41, "sol_pct": 27.41,
                 "batch": 256, "wall_s": 40.0},
        "ddim50": {"sps": 1949.4, "steps": 50, "eta": 0.0, "wall_s": 5.4},
        "distill8": {"sps": 10037.2, "steps": 8, "objective": "pred_v", "wall_s": 4.8},
        "quality": {"fid_rand": 12.632, "loss300": 0.42281,
                    "extractor": "inception_random",
                    "task": "blobs 16x16, dim-16 U-Net, T=100, 300 steps @ B=64",
                    "note": "seeded relative metrics", "wall_s": 215.2},
        "dim128": {"sps": 25.3851, "mfu_pct": 64.53, "sol_pct": 64.53,
                   "params": 25173763,
                   "train": {"sps": 5560.8, "ms_per_step": 23.018,
                             "mfu_est_pct": 42.41}, "wall_s": 188.8},
        "tpu_s2d": {"sps": 330.7567, "mfu_pct": 20.34, "sol_pct": 20.34,
                    "params": 1770508, "tpu_geometry": "s2d",
                    "train": {"sps": 19397.8, "ms_per_step": 6.599,
                              "mfu_est_pct": 3.58}, "wall_s": 72.9},
        "dit50": {"sps": 77.8, "steps": 50, "geometry": "DiT-S/2",
                  "mfu_pct": 24.11, "params": 32471436, "wall_s": 71.8},
        "dpm20": {"sps": 4348.6, "steps": 20, "order": 2, "wall_s": 4.7},
        "edm18": {"sps": 2765.0, "steps": 18, "order": 2, "nfe": 35, "wall_s": 12.2},
        "pc_sde": {"sps": 52.97, "nfe": 2000, "predictor": "reverse_diffusion",
                   "corrector": "langevin", "wall_s": 22.7},
        "latent1000": {"sps": 216.7, "steps": 1000, "latent": "16x16x4",
                       "unet_params": 1972580, "wall_s": 88.5},
        "serving": {"images_per_sec": 1910.3, "ddim_steps": 50, "requests": 64,
                    "images_per_request": 16, "mean_latency_ms": 327.286,
                    "batch_fill": 1.0, "errors": [], "wall_s": 5.1},
        "wall_s_total": 1213.2,
    }


def test_compact_line_fits_tail_window_with_every_leg():
    state = _full_state()
    line = json.dumps(bench._compact_state(state))
    assert len(line) < 1500, f"compact line {len(line)} chars: {line}"
    c = json.loads(line)
    assert c["compact"] is True
    assert c["value"] == 108.0982 and c["unit"] == "samples/sec/chip"
    assert c["vs_baseline"] == 106.658 and c["mfu_pct"] == 26.63
    assert c["topology"].startswith("Unet dim=32")
    # parity + budgets carried whole (minus wall_s), one number per other leg
    assert c["parity"]["max_param_delta"] == 0.000199
    assert "wall_s" not in c["parity"]
    assert c["step_budget"]["us_per_step"]["device_total"] == 1172.9
    assert c["train_budget"]["us_per_step"]["device_total"] == 3118.0
    assert c["legs"]["serving"] == 1910.3  # images_per_sec primary
    assert c["legs"]["quality"] == 12.632  # fid_rand primary
    assert c["legs"]["bpd"] == 12.3456
    assert c["legs"]["ref_topo"] == 38.1234
    assert c["legs"]["train"] == 15941.3
    assert c["legs"]["b256"] == 111.2345


def test_compact_line_marks_skips_and_errors():
    state = _full_state()
    state["dim128"] = {"skipped": "budget"}
    state["serving"] = {"error": "RuntimeError: boom", "wall_s": 1.0}
    c = json.loads(json.dumps(bench._compact_state(state)))
    assert c["legs"]["dim128"] == "skip"
    assert c["legs"]["serving"] == "err"


def test_compact_line_is_small_even_at_t0():
    # the very first emission (value null, no legs) must also be parseable
    c = bench._compact_state({"metric": "m", "value": None,
                              "unit": "samples/sec/chip", "vs_baseline": None,
                              "batch": 128, "timesteps": 1000})
    line = json.dumps(c)
    assert len(line) < 1500
    assert json.loads(line)["value"] is None
