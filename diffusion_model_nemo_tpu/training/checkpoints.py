"""Checkpointing: Orbax step checkpoints + single-file ``.dmn`` export.

Replaces the NeMo/PTL checkpoint stack the reference relies on
(``always_save_nemo`` archives of config+weights, ``restore_from``,
``maybe_init_from_pretrained_checkpoint`` — SURVEY §5). Two formats:

- **Step checkpoints** (Orbax): {params, ema_params, opt_state, step} with
  top-k retention on a monitored metric; used for resume.
- **``.dmn`` archive**: a tar file holding ``model_config.yaml`` + msgpack
  weights (+ EMA) — the equivalent of the ``.nemo`` single-file export, used
  by ``Model.restore_from`` / ``save_to``.
"""

from __future__ import annotations

import io
import os
import tarfile
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from ..config.yaml_config import from_dict, to_dict, to_yaml
import yaml

__all__ = ["CheckpointManager", "save_archive", "load_archive", "load_aux_weights"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for train-state dicts."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 1,
        monitor: str = "train_loss",
        mode: str = "min",
        save_interval_steps: int = 1,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            best_fn=(lambda m: m.get(self.monitor, 0.0)) if monitor else None,
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, state: Dict[str, Any], metrics: Optional[Dict[str, float]] = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, step: Optional[int] = None, template: Optional[Dict[str, Any]] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_archive(
    path: str,
    cfg: Any,
    params: Any,
    ema_params: Optional[Any] = None,
    extra: Optional[Dict[str, Any]] = None,
    aux_weights: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a single-file ``.dmn`` archive (config + weights [+ EMA]).

    ``aux_weights`` holds named frozen parameter trees that ride alongside
    the trained weights (e.g. a latent-diffusion model's first-stage VAE) —
    each becomes an ``aux_<name>.msgpack`` member so the archive stays
    self-contained: restoring never needs the original first-stage file.
    """
    path = str(path)
    params = jax.device_get(params)
    members: Dict[str, bytes] = {
        "model_config.yaml": to_yaml(cfg).encode(),
        "model_weights.msgpack": serialization.msgpack_serialize(to_dict_arrays(params)),
    }
    if ema_params is not None:
        members["ema_weights.msgpack"] = serialization.msgpack_serialize(
            to_dict_arrays(jax.device_get(ema_params))
        )
    for name, tree in (aux_weights or {}).items():
        members[f"aux_{name}.msgpack"] = serialization.msgpack_serialize(
            to_dict_arrays(jax.device_get(tree))
        )
    if extra:
        members["extra.yaml"] = yaml.safe_dump(extra).encode()

    with tarfile.open(path, "w") as tar:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return path


def load_archive(path: str):
    """Read a ``.dmn`` archive → (cfg, params, ema_params or None, extra)."""
    with tarfile.open(path, "r") as tar:
        names = tar.getnames()

        def read(name):
            f = tar.extractfile(name)
            return f.read() if f else None

        cfg = from_dict(yaml.safe_load(read("model_config.yaml")))
        params = serialization.msgpack_restore(read("model_weights.msgpack"))
        ema = (
            serialization.msgpack_restore(read("ema_weights.msgpack"))
            if "ema_weights.msgpack" in names
            else None
        )
        extra = yaml.safe_load(read("extra.yaml")) if "extra.yaml" in names else None
    return cfg, params, ema, extra


def load_aux_weights(path: str) -> Dict[str, Any]:
    """Read the ``aux_<name>.msgpack`` members of a ``.dmn`` archive →
    {name: numpy param tree}. Empty dict when the archive carries none."""
    out: Dict[str, Any] = {}
    with tarfile.open(str(path), "r") as tar:
        for name in tar.getnames():
            if name.startswith("aux_") and name.endswith(".msgpack"):
                f = tar.extractfile(name)
                out[name[len("aux_"):-len(".msgpack")]] = serialization.msgpack_restore(
                    f.read()
                )
    return out


def to_dict_arrays(tree: Any) -> Any:
    """jax arrays → numpy for msgpack."""
    return jax.tree.map(lambda x: np.asarray(x), tree)
