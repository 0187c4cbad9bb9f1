from setuptools import find_packages, setup

setup(
    name="diffusion_model_nemo_tpu",
    version="0.1.0",
    description=(
        "TPU-native JAX diffusion-model framework: DDPM / Improved DDPM / "
        "Conditional DDPM / Score-SDE / WaveGrad with fused lax.scan samplers, "
        "pjit data-parallel training, Orbax checkpoints, and a Hydra-style "
        "YAML config surface"
    ),
    packages=find_packages(include=["diffusion_model_nemo_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "einops",
        "numpy",
        "pyyaml",
        "pillow",
    ],
    extras_require={
        "data": ["datasets"],
        "logging": ["tensorboardX", "wandb"],
        "test": ["pytest", "chex"],
    },
)
