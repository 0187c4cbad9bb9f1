"""Cascaded diffusion generation — Ho et al. 2022 (arXiv:2106.15282).

Beyond the reference's model surface (its families sample at one fixed
resolution, diffusion_model_nemo/models/): a pipeline that chains a BASE
generator (any family whose ``sample`` returns display-space images — DDPM,
ImprovedDDPM, ConditionalDDPM, EDM, RectifiedFlow, LatentDiffusion, …) with
one or more SR3 upscalers, each super-resolving the previous stage's output.
High-resolution synthesis then costs a small base chain plus a few refinement
chains instead of one giant full-resolution chain — on TPU this is the
architecture-level throughput lever: every stage keeps its own fused
``lax.scan`` and cached fixed-shape jit, and the inter-stage tensors stay on
device (no host round trips between stages).

Key-stream contract (pinned by tests/test_cascade.py): stage ``i`` of the
pipeline uses ``jax.random.fold_in(key, i)`` — stage 0 is the base, stage
``i >= 1`` the ``i``-th upscaler — so a cascade sample is bitwise equal to
running the stages by hand with those keys, and adding an upscaler never
changes the earlier stages' randomness.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..utils import logging

__all__ = ["CascadePipeline"]


class CascadePipeline:
    """Base generator + chain of SR3 upscalers with validated geometry.

    Args:
        base: any model with ``sample(batch_size, image_size, key=...)``
            returning [B, H, W, C] display-space ([0, 1]) images.
        upscalers: SR3 models, ordered low→high resolution. Each stage's
            LR input size (``image_size // scale_factor``) must equal the
            previous stage's output size, and channels must match.
    """

    def __init__(self, base, upscalers: Sequence):
        upscalers = list(upscalers)
        if not upscalers:
            raise ValueError("CascadePipeline needs at least one SR3 upscaler")
        size = int(base.image_size)
        channels = int(base.channels)
        for i, up in enumerate(upscalers):
            if not (hasattr(up, "super_resolve") and hasattr(up, "scale_factor")):
                raise TypeError(
                    f"upscaler {i} ({type(up).__name__}) is not an SR3-style "
                    "model (needs super_resolve + scale_factor)"
                )
            lr_size = int(up.image_size) // int(up.scale_factor)
            if lr_size != size:
                raise ValueError(
                    f"geometry mismatch at stage {i + 1}: upscaler expects "
                    f"{lr_size}x{lr_size} inputs (image_size "
                    f"{int(up.image_size)} / scale_factor {int(up.scale_factor)}) "
                    f"but the previous stage produces {size}x{size}"
                )
            if int(up.channels) != channels:
                raise ValueError(
                    f"channel mismatch at stage {i + 1}: upscaler has "
                    f"{int(up.channels)} channels, previous stage {channels}"
                )
            size = int(up.image_size)
        self.base = base
        self.upscalers: List = upscalers
        self.final_image_size = size
        self.channels = channels

    @property
    def stages(self) -> List:
        return [self.base] + self.upscalers

    def sample(
        self,
        batch_size: int,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        return_stages: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        **base_kwargs,
    ):
        """Run the full cascade: base sample → SR3 chain.

        Extra kwargs go to the base's ``sample`` (e.g. ``label=`` /
        ``guidance_scale=`` for conditional bases). With ``mesh`` every
        stage shards its batch over the mesh's data axis (stage outputs
        stay sharded on device between stages).

        Returns [B, final, final, C] in [0, 1]; with ``return_stages`` a
        list of every stage's output, low→high resolution.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        shared = dict(use_ema=use_ema)
        if mesh is not None:
            shared.update(mesh=mesh, shard_axis=shard_axis)
        x = self.base.sample(
            batch_size,
            int(self.base.image_size),
            key=jax.random.fold_in(key, 0),
            **shared,
            **base_kwargs,
        )
        outs = [x]
        for i, up in enumerate(self.upscalers):
            x = up.super_resolve(x, key=jax.random.fold_in(key, i + 1), **shared)
            outs.append(x)
        return outs if return_stages else x

    @classmethod
    def from_archives(
        cls,
        base_path: str,
        upscaler_paths: Sequence[str],
        use_ema: bool = False,
        trainer=None,
    ) -> "CascadePipeline":
        """Build a cascade from ``.dmn`` archives: the base restores through
        the generic family dispatch, the upscalers must be SR3 archives."""
        from ..models import SR3, restore_model_from_archive

        base = restore_model_from_archive(base_path, use_ema=use_ema, trainer=trainer)
        ups = [SR3.restore_from(p, trainer=trainer, use_ema=use_ema) for p in upscaler_paths]
        pipe = cls(base, ups)
        logging.info(
            f"Cascade: {type(base).__name__}@{int(base.image_size)} → "
            + " → ".join(
                f"SR3@{int(u.image_size)}(x{int(u.scale_factor)})" for u in ups
            )
        )
        return pipe
