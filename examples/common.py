"""Shared example-script plumbing: a tiny @hydra_runner equivalent.

The reference's scripts use NeMo's ``@hydra_runner(config_path, config_name)``
with dotted CLI overrides (examples/ddpm/train_ddpm.py:64). This provides the
same surface on the framework's own config layer:

    @hydra_runner(config_path="../configs/ddpm", config_name="unet_small.yaml")
    def main(cfg): ...

CLI: ``python train_ddpm.py model.image_size=32 trainer.max_epochs=5``;
``--config-path``/``--config-name`` flags are honored like Hydra's.
Dataclass-schema mode (``schema=SomeDataclass``) covers the eval/test scripts.
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
import sys
from pathlib import Path
from typing import Optional

# Allow running example scripts from a source checkout without pip install.
_repo_root = str(Path(__file__).resolve().parents[1])
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

# DMN_TPU_PLATFORM=cpu forces the jax backend (CI drives the CLIs on the
# virtual CPU mesh; env vars alone don't switch backends when a
# sitecustomize pre-imports jax, so update the config after import).
import os as _os

if _os.environ.get("DMN_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DMN_TPU_PLATFORM"])

from diffusion_model_nemo_tpu.config import from_dict, load_config


def hydra_runner(config_path: Optional[str] = None, config_name: Optional[str] = None, schema=None):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper():
            argv = sys.argv[1:]
            cpath, cname = config_path, config_name
            overrides = []
            it = iter(argv)
            for arg in it:
                if arg == "--config-path":
                    cpath = next(it)
                elif arg.startswith("--config-path="):
                    cpath = arg.split("=", 1)[1]
                elif arg == "--config-name":
                    cname = next(it)
                elif arg.startswith("--config-name="):
                    cname = arg.split("=", 1)[1]
                else:
                    overrides.append(arg)

            if schema is not None:
                base = from_dict(dataclasses.asdict(schema()))
                from diffusion_model_nemo_tpu.config import apply_overrides, resolve_interpolations

                cfg = resolve_interpolations(apply_overrides(base, overrides))
            else:
                script_dir = Path(inspect.getfile(fn)).parent
                path = Path(cpath) / cname if cpath else Path(cname)
                if not path.is_absolute() and not path.exists():
                    path = script_dir / path
                cfg = load_config(path, overrides=overrides)
            return fn(cfg)

        return wrapper

    return deco
