"""bench.py driver-surface smoke tests (the round-3 driver bench produced
NOTHING — rc=124, no output — so the contract 'always print a parseable
line, rc=0' is now pinned).

Subprocess-driven with the CPU/tiny knobs; slow (two fresh interpreters
each compiling a small scan).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def _run_bench(extra_env, timeout=420):
    env = dict(
        os.environ,
        DMN_BENCH_CPU="1",
        DMN_BENCH_T="10",
        DMN_BENCH_BATCH="8",
        DMN_BENCH_FULL="0",
        **extra_env,
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON lines in stdout: {proc.stdout[-2000:]}"
    records = [json.loads(l) for l in lines]
    # every full emission is immediately followed by a compact summary line —
    # the LAST printed line must always be a compact one (the driver's
    # 2000-char tail window parses that line; BENCH_r04 lesson)
    assert records[-1].get("compact") is True
    compacts = [r for r in records if r.get("compact")]
    for c in compacts:
        assert len(json.dumps(c)) < 1500, f"compact line too long: {len(json.dumps(c))}"
        assert "value" in c and "vs_baseline" in c
    records = [r for r in records if not r.get("compact")]
    # every full emission is a record with the headline keys
    for r in records:
        assert r["unit"] == "samples/sec/chip"
        assert "value" in r and "vs_baseline" in r
    return records


def test_incremental_emission_and_final_record():
    """A normal tiny run prints multiple progressively-richer records; the
    final one has a measured value, a real (or explicitly absent) baseline,
    and the roofline fields."""
    records = _run_bench({"DMN_BENCH_BUDGET_S": "360"})
    assert len(records) >= 3  # t=0 line, device line, north star, baseline
    final = records[-1]
    assert final["value"] is not None and final["value"] > 0
    assert final["mfu_pct"] >= 0 and final["sol_pct"] >= 0
    # vs_baseline is either measured or explicitly absent with a reason —
    # never a fabricated constant
    assert (final["vs_baseline"] is not None) or ("baseline_error" in final)
    assert "wall_s_total" in final or "budget_expired" in final


def test_budget_expiry_still_yields_parseable_record():
    """With an absurdly small budget the watchdog must still exit 0 with a
    parseable record marking what was interrupted."""
    records = _run_bench({"DMN_BENCH_BUDGET_S": "5"}, timeout=240)
    final = records[-1]
    # either the cooperative path skipped everything before starting, or the
    # watchdog fired mid-leg — both must leave explicit skip markers, never
    # silently-missing legs
    skipped = [
        v for v in final.values()
        if isinstance(v, dict) and "skipped" in v
    ]
    assert skipped, final
    assert final.get("budget_expired") or any(
        v.get("skipped", "").startswith(("budget", "northstar")) for v in skipped
    )
