"""diffusion_model_nemo_tpu — a TPU-native JAX diffusion-model framework.

A from-scratch rebuild of the capabilities of ``titu1994/diffusion_model_nemo``
(PyTorch/NeMo) designed for TPU: JAX/XLA/Pallas compute, ``lax.scan`` samplers
resident in HBM, pjit data-parallel training over a device mesh, Orbax
checkpoints, and a Hydra-style YAML ``_target_`` config surface compatible
with the reference's configs.
"""

__version__ = "0.1.0"

from . import config, ops, utils

utils.maybe_enable_from_env()  # DMN_COMPILE_CACHE_DIR opt-in


def __getattr__(name):
    # Lazy subpackage access to keep bare import light.
    import importlib

    if name in ("modules", "models", "loss", "data", "training", "parallel"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
