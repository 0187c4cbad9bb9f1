"""One-shot torch-vs-framework training parity probe (bench.py ``parity`` leg).

Runs the 8-step reference-hot-loop lockstep comparison from
tests/test_torch_parity_training.py (torch replica of the reference's
models/ddpm.py:43-77 loop vs this framework's modules, identical inputs and
transplanted weights) on the CPU backend and prints ONE JSON line:
``{"max_loss_delta": ..., "max_param_delta": ..., "steps": 8}``.

Run from the repo root in a fresh interpreter: the numerics are
CPU-for-CPU (the TPU backend's f32 conv rounding would perturb the
comparison), and this rig's sitecustomize pre-imports jax with the TPU
platform — so the caller (bench.py) launches this as a subprocess and the
platform switch below happens before any device is touched.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # AFTER import (CLAUDE.md)


def main() -> None:
    from tests.test_torch_parity_training import STEPS, run_parity

    res = run_parity()
    print(
        json.dumps(
            {
                "max_loss_delta": float(f"{res['max_loss_delta']:.3g}"),
                "max_param_delta": float(f"{res['max_param_delta']:.3g}"),
                "steps": STEPS,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
