"""SR3 super-resolution diffusion — Saharia et al. 2021 (arXiv:2104.07636).

Beyond the reference's model surface (its families are all unconditional or
class-conditional, diffusion_model_nemo/models/): iterative-refinement
super-resolution — the denoiser is conditioned on the bicubic-upsampled
low-res image by CHANNEL CONCATENATION (x_t ‖ up(lr) → 2C input channels),
trained with the standard DDPM objective on (LR, HR) pairs synthesized
on-device from the training images (downsample → upsample inside the jitted
step, so any image dataset is an SR dataset).

Because the conditioning lives entirely inside ``get_model_fn`` (the same
binding pattern ConditionalDDPM uses for labels), everything built on the
bound model function — training, the fused sampling scans, DDIM/DPM/Karras
sampler swaps, the exact bits/dim scan, mesh sharding — works unchanged.

Public surface: ``super_resolve(lr)`` (the conditioned ``sample``),
``test_step`` = conditional bits/dim (inherited), the standard archive
round trip. CLIs in examples/sr3/.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_target
from ..data.hf_vision_data import preprocess_batch
from ..utils import logging
from .ddpm import DDPM

__all__ = ["SR3"]

_RESIZE_METHODS = ("bilinear", "bicubic", "lanczos3", "nearest")


@register_target(
    "diffusion_model_nemo.models.SR3",
    "diffusion_model_nemo_tpu.models.SR3",
)
class SR3(DDPM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        self.scale_factor = int(self.cfg.get("scale_factor", 4))
        if self.scale_factor < 2:
            raise ValueError(f"scale_factor must be >= 2, got {self.scale_factor}")
        if int(self.image_size) % self.scale_factor:
            raise ValueError(
                f"image_size {self.image_size} not divisible by scale_factor "
                f"{self.scale_factor}"
            )
        self.lowres_method = str(self.cfg.get("lowres_method", "bicubic"))
        if self.lowres_method not in _RESIZE_METHODS:
            raise ValueError(
                f"lowres_method must be one of {_RESIZE_METHODS}, got {self.lowres_method}"
            )
        # Gaussian conditioning augmentation (Ho et al. 2022 §3.3, the
        # ingredient that makes SR3 stages robust as CASCADE upscalers: the
        # train-time conditioning is a clean down(HR) but at inference it is
        # a previous diffusion stage's imperfect output). Train-time only;
        # 0.0 (default) keeps the plain-SR3 key stream bitwise unchanged.
        self.cond_aug_std = float(self.cfg.get("cond_aug_std", 0.0))
        if self.cond_aug_std < 0:
            raise ValueError(f"cond_aug_std must be >= 0, got {self.cond_aug_std}")
        self._vis_batch = None  # cached host batch for periodic sample dumps

    def _example_input_channels(self) -> int:
        return 2 * int(self.channels)  # [x_t, upsampled LR]

    # ---- conditioning ------------------------------------------------------------
    def degrade(self, samples: jnp.ndarray) -> jnp.ndarray:
        """HR [-1,1] -> LR [-1,1] (antialiased resize; the training-time
        degradation model, SR3 §2)."""
        B, H, W, C = samples.shape
        s = self.scale_factor
        return jax.image.resize(
            samples, (B, H // s, W // s, C), method=self.lowres_method, antialias=True
        )

    def upsample(self, lr: jnp.ndarray) -> jnp.ndarray:
        """LR [-1,1] -> conditioning at HR resolution (bicubic up, SR3 §2)."""
        B, h, w, C = lr.shape
        s = self.scale_factor
        return jax.image.resize(
            lr, (B, h * s, w * s, C), method=self.lowres_method, antialias=False
        )

    def _lowres_condition(self, samples: jnp.ndarray) -> jnp.ndarray:
        return self.upsample(self.degrade(samples))

    def get_model_fn(self, batch: Optional[Dict] = None, training: bool = False,
                     key=None, cond: Optional[jnp.ndarray] = None):
        """Bind the low-res conditioning: from an explicit ``cond`` (already
        at HR resolution, [-1,1]) or derived on-device from the batch's HR
        images (down -> up). The bound fn concatenates it on channels, so
        every sampler sees a plain ``model_fn(params, x, t)``."""
        if cond is None and batch is not None:
            cond = self._lowres_condition(batch["pixel_values"])
            if training and self.cond_aug_std > 0 and key is not None:
                # fold_in with a fixed tag: the dropout stream (raw `key`)
                # is untouched, so cond_aug_std=0 runs stay bitwise equal.
                cond = cond + self.cond_aug_std * jax.random.normal(
                    jax.random.fold_in(key, 0x5347), cond.shape, cond.dtype
                )
        dropout_rng = key if training else None

        def fn(params, x, t):
            if cond is None:
                raise ValueError(
                    "SR3 needs low-res conditioning: pass a batch or cond= "
                    "to get_model_fn (use super_resolve for inference)"
                )
            c = jnp.broadcast_to(cond.astype(x.dtype), x.shape)
            return self.model_fn(
                params, jnp.concatenate([x, c], axis=-1), t, dropout_rng=dropout_rng
            )

        return fn

    # ---- inference -----------------------------------------------------------------
    def super_resolve(
        self,
        lr: jnp.ndarray,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        data_space: bool = False,
        mesh=None,
        shard_axis: str = "batch",
    ):
        """Iterative-refinement SR: [B, H/s, W/s, C] -> [B, H, W, C] in [0,1].

        ``lr`` in [0, 1] display space (``data_space=True`` for [-1, 1]).
        Cached-jit fused sampling scan, mesh semantics like DDPM.sample.
        """
        assert lr.ndim == 4, f"lr is not a batch of images: {lr.shape}"
        key = key if key is not None else jax.random.PRNGKey(0)
        lr = jnp.asarray(lr, jnp.float32)
        if not data_space:
            lr = lr * 2.0 - 1.0
        B, h, w, C = lr.shape
        s = self.scale_factor
        shape = (B, h * s, w * s, int(self.channels))
        sampler = self.sampler
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, lr, key):
                model_fn = self.get_model_fn(cond=self.upsample(lr))
                return sampler.p_sample_loop(
                    model_fn, params, shape, key, return_frames=return_frames
                )

            if mesh is None:
                if shard_axis != "batch":
                    raise ValueError(f"shard_axis={shard_axis!r} requires mesh=")
                return jax.jit(fn)
            rep, out, frames_out = sample_shardings(mesh, shape, shard_axis, frames=True)
            _, lr_sharding, _ = sample_shardings(mesh, lr.shape, shard_axis, frames=True)
            out_shardings = (out, frames_out) if return_frames else out
            return jax.jit(
                fn, in_shardings=(rep, lr_sharding, rep), out_shardings=out_shardings
            )

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "super_resolve", build, shape, return_frames,
            mesh_cache_key(mesh), shard_axis,
        )(params, lr, key)

    def sample(self, batch_size: int, image_size: int, key=None, lr=None, **kwargs):
        """Conditioned sample: requires ``lr`` (or falls back to LRs derived
        from the training/test dataloader — the periodic sample-grid path)."""
        if lr is None:
            lr = self._dataset_lr(batch_size)
            if lr is None:
                raise ValueError(
                    "SR3.sample needs lr= (no dataloader attached to derive "
                    "a visualization batch from); use super_resolve(lr)"
                )
            return self.super_resolve(lr, key=key, data_space=True, **kwargs)
        return self.super_resolve(lr, key=key, **kwargs)

    def _dataset_lr(self, batch_size: int):
        """One cached host batch -> LR conditioning ([-1,1]) for sample dumps."""
        if self._vis_batch is None:
            dl = self._train_dl or self._test_dl
            if dl is None:
                return None
            batch = next(iter(dl))
            proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
            self._vis_batch = np.asarray(self.degrade(proc["pixel_values"]))
        n = min(batch_size, self._vis_batch.shape[0])
        return jnp.asarray(self._vis_batch[:n])

    def interpolate(self, *args, **kwargs):
        raise NotImplementedError(
            "SR3 is conditioned on a low-res image; interpolate is undefined "
            "(super-resolve two LRs and blend in LR space instead)"
        )

    # ---- evaluation ------------------------------------------------------------------
    # test_step/test_epoch_end inherit DDPM's conditional bits/dim: the
    # inherited test_step builds model_fn = get_model_fn(proc), which binds
    # the on-device (down -> up) conditioning derived from the test batch.

    def calculate_bits_per_dimension(
        self, x_start, params=None, key=None, max_batch_size: int = 32, model_fn=None
    ):
        """Conditional bits/dim: p(HR | LR) with the LR derived from
        ``x_start`` (down -> up) when no bound model_fn is given — keeps the
        Trainer's periodic bpd logging working unmodified."""
        if model_fn is None:
            if max_batch_size > 0:
                x_start = x_start[: min(max_batch_size, x_start.shape[0])]
            model_fn = self.get_model_fn(cond=self._lowres_condition(x_start))
            max_batch_size = -1
        return super().calculate_bits_per_dimension(
            x_start, params=params, key=key,
            max_batch_size=max_batch_size, model_fn=model_fn,
        )

    def psnr(self, sr: jnp.ndarray, hr: jnp.ndarray, max_val: float = 1.0):
        """Batch PSNR (dB) in [0,1] display space — the SR literature's
        headline metric (SR3 Table 1)."""
        mse = jnp.mean((jnp.asarray(sr) - jnp.asarray(hr)) ** 2, axis=(1, 2, 3))
        return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))
