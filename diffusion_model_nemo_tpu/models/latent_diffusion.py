"""Latent diffusion: any DDPM-family process running in a frozen VAE's latent.

Beyond the reference's model surface (its families — reference
diffusion_model_nemo/models/ — all diffuse in pixel space): this is the LDM
recipe (Rombach et al. 2022, arXiv:2112.10752). A trained
:class:`AutoencoderKLModel` compresses images 2^k× per side; the U-Net +
GaussianDiffusion/DDIM/DPM-Solver machinery from the pixel families then
trains and samples UNCHANGED on the [B, S/f, S/f, z] latents — the diffusion
cost drops by ~f² while the decode is a single forward pass.

TPU design points:

- The first stage is **frozen**: its params are closed over by the pure
  ``training_step``, so jit hoists them as constants — they never enter the
  donated/optimized pytree and the optimizer state stays U-Net-sized.
- encode (with ``stop_gradient``) runs INSIDE the jitted train step, fused
  with preprocessing — no separate encode dispatch, no host round-trip.
- ``sample`` jits the whole chain: fused reverse scan in latent space →
  one decoder pass → display mapping, one dispatch end to end.
- Archives are self-contained: ``save_to`` embeds the first-stage weights as
  an ``aux_first_stage`` member, so ``restore_from``/serving never need the
  original VAE file.

Config (examples/configs/latent_diffusion/latent_ddpm.yaml): a normal DDPM
config whose ``diffusion_model.channels``/``input_dim`` are the LATENT
geometry, plus a ``first_stage`` block — either ``restore_from: <ae.dmn>``
(the trained VAE archive; EMA weights preferred) or an inline
``autoencoder: {_target_: ...AutoencoderKL, ...}`` spec (random init — tests
and from-scratch experiments).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import get_target, instantiate, register_target
from ..config.yaml_config import from_dict
from ..data.hf_vision_data import preprocess_batch
from ..modules.autoencoder import AutoencoderKL, diagonal_gaussian_sample
from ..training import checkpoints as ckpt_lib
from ..utils import logging
from .ddpm import DDPM

__all__ = ["LatentDiffusion"]


def _build_first_stage(fs_cfg) -> AutoencoderKL:
    """Instantiate the AutoencoderKL flax module from a first_stage block."""
    net_cfg = dict(fs_cfg)
    net_cfg.pop("_target_", None)
    if net_cfg.get("dim_mults") is not None:
        net_cfg["dim_mults"] = tuple(net_cfg["dim_mults"])
    target = get_target(str(fs_cfg.get("_target_", "diffusion_model_nemo.modules.AutoencoderKL")))
    return target(**net_cfg)


@register_target(
    "diffusion_model_nemo.models.LatentDiffusion",
    "diffusion_model_nemo_tpu.models.LatentDiffusion",
)
class LatentDiffusion(DDPM):
    def __init__(self, cfg, trainer=None):
        super().__init__(cfg, trainer=trainer)
        fs = self.cfg.get("first_stage")
        if fs is None:
            raise ValueError(
                "LatentDiffusion requires cfg.first_stage (restore_from: <ae.dmn> "
                "or an inline autoencoder: {...AutoencoderKL} spec)"
            )
        fs = from_dict(fs)
        src = fs.get("restore_from")
        if src:
            ae_cfg, ae_params, ae_ema, _ = ckpt_lib.load_archive(str(src))
            self.first_stage = _build_first_stage(ae_cfg["diffusion_model"])
            chosen = ae_ema if (ae_ema is not None and bool(fs.get("use_ema", True))) else ae_params
            self.first_stage_params = jax.tree.map(jnp.asarray, chosen)
            logging.info(f"LatentDiffusion first stage restored from : {src}")
        elif fs.get("autoencoder") is not None:
            self.first_stage = _build_first_stage(fs["autoencoder"])
            self.first_stage_params = None  # lazily initialized in init_params
        else:
            raise ValueError(
                "first_stage needs either restore_from: <path> or autoencoder: {...}"
            )
        # LDM latent scaling: training/sampling see z · scale_factor so the
        # diffusion prior N(0, I) matches the latent scale. Set it to
        # 1/std(z) of a data batch (calibrate_scale_factor) or in the YAML.
        self.scale_factor = float(self.cfg.get("scale_factor", 1.0))
        # Sample the posterior during training (True, LDM default) or use its
        # mode (False — deterministic latents).
        self.posterior_sample = bool(self.cfg.get("posterior_sample", True))

        f = int(self.first_stage.downsample_factor)
        if int(self.image_size) % f:
            raise ValueError(
                f"image_size {self.image_size} is not divisible by the first "
                f"stage's downsample factor {f}"
            )
        self.latent_size = int(self.image_size) // f
        self.latent_channels = int(self.first_stage.z_channels)
        net_ch = self.cfg.get("diffusion_model", {}).get("channels")
        if net_ch is not None and int(net_ch) != self.latent_channels:
            raise ValueError(
                f"diffusion_model.channels ({net_ch}) must equal the first "
                f"stage's z_channels ({self.latent_channels}) — the U-Net "
                "runs in latent space"
            )

    # ---- geometry hooks (base init_params builds the example input) -----------
    def _example_input_channels(self) -> int:
        return self.latent_channels

    def _example_spatial_size(self) -> int:
        return self.latent_size

    def init_params(self, key: Optional[jax.Array] = None) -> Any:
        if self.first_stage_params is None:
            k = key if key is not None else jax.random.PRNGKey(int(self.cfg.get("seed", 0)))
            x = jnp.zeros(
                (1, int(self.image_size), int(self.image_size), int(self.channels)),
                jnp.float32,
            )
            self.first_stage_params = self.first_stage.init(
                {"params": jax.random.fold_in(k, 1)}, x
            )["params"]
            logging.info(
                "LatentDiffusion first stage randomly initialized (no "
                "restore_from given) — train the AutoencoderKLModel first for "
                "real runs"
            )
        return super().init_params(key)

    # ---- first-stage application (pure; params explicit) ----------------------
    def encode_to_latent(
        self, fs_params, x: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """[-1,1] images → scaled latents (posterior draw with ``key``)."""
        mean, logvar = self.first_stage.apply({"params": fs_params}, x, method="encode")
        z = diagonal_gaussian_sample(mean, logvar, key)
        return z * self.scale_factor

    def decode_from_latent(self, fs_params, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents → [-1,1] images."""
        return self.first_stage.apply(
            {"params": fs_params}, z / self.scale_factor, method="decode"
        )

    def calibrate_scale_factor(self, batch: Dict[str, np.ndarray]) -> float:
        """LDM's one-time latent normalization: set scale_factor = 1/std(z)
        over one data batch (posterior mode), persist it into the cfg, and
        invalidate jits so subsequent traces bake the new constant."""
        proc = preprocess_batch(jax.tree.map(jnp.asarray, batch), key=None, train=False)
        mean, _ = self.first_stage.apply(
            {"params": self.first_stage_params}, proc["pixel_values"], method="encode"
        )
        std = float(jnp.std(mean))
        self.scale_factor = 1.0 / max(std, 1e-8)
        self.cfg["scale_factor"] = self.scale_factor
        self._jit_cache.clear()
        logging.info(f"Calibrated latent scale_factor = {self.scale_factor:.4f} (std {std:.4f})")
        return self.scale_factor

    # ---- training --------------------------------------------------------------
    def training_step(self, params, batch, key, step):
        """DDPM Algorithm 1 in latent space; encode fused into the jitted
        step, first-stage params closed over as frozen constants."""
        k_pre, k_enc, k_t, k_noise, k_drop = jax.random.split(key, 5)
        proc = preprocess_batch(batch, k_pre, train=True)
        x = proc["pixel_values"]
        fs_params = self.first_stage_params
        z = self.encode_to_latent(fs_params, x, k_enc if self.posterior_sample else None)
        z = jax.lax.stop_gradient(z)
        B = z.shape[0]

        model_fn = self.get_model_fn(proc, training=True, key=k_drop)
        t = jax.random.randint(k_t, (B,), 0, self.timesteps, dtype=jnp.int32)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        z_t = self.sampler.q_sample(x_start=z, t=t, noise=noise)
        model_output = model_fn(params, z_t, t)

        if getattr(self.sampler, "objective", "pred_noise") == "pred_v":
            target = self.sampler.v_target(z, t, noise)
        else:
            target = noise
        loss = self.loss(input=model_output, target=target)
        return loss, {"train_loss": loss}

    # ---- evaluation -------------------------------------------------------------
    def test_step(self, batch, batch_nb: int, key=None) -> Dict[str, jnp.ndarray]:
        """Latent ε-prediction loss on held-out data (the pixel families'
        discrete VLB bits/dim is not comparable across the decoder — the
        latent VLB is not the pixel NLL, so we report the train objective)."""
        key = key if key is not None else jax.random.PRNGKey(batch_nb)
        proc_in = jax.tree.map(jnp.asarray, batch)

        def build():
            def fn(params, batch, key):
                k_enc, k_t, k_noise = jax.random.split(key, 3)
                proc = preprocess_batch(batch, None, train=False)
                z = self.encode_to_latent(self.first_stage_params, proc["pixel_values"], None)
                B = z.shape[0]
                model_fn = self.get_model_fn(proc)
                t = jax.random.randint(k_t, (B,), 0, self.timesteps, dtype=jnp.int32)
                noise = jax.random.normal(k_noise, z.shape, z.dtype)
                z_t = self.sampler.q_sample(x_start=z, t=t, noise=noise)
                loss = self.loss(input=model_fn(params, z_t, t), target=noise)
                return loss * B

            return jax.jit(fn)

        shapes = jax.tree.map(lambda v: v.shape, proc_in)
        out = self._jitted("test_step", build, str(shapes))(self.params, proc_in, key)
        n = next(iter(proc_in.values())).shape[0]
        return {"sum_loss": out, "num_samples": jnp.asarray(n, jnp.int32)}

    def test_epoch_end(self, outputs) -> Dict[str, float]:
        total = float(sum(np.asarray(o["num_samples"]) for o in outputs))
        result = {
            "test_latent_loss": float(sum(np.asarray(o["sum_loss"]) for o in outputs)) / total
        }
        logging.info(f"LatentDiffusion test: {result}")
        return result

    # ---- inference services -------------------------------------------------------
    def sample(
        self,
        batch_size: int,
        image_size: int,
        key: Optional[jax.Array] = None,
        use_ema: bool = False,
        return_frames: bool = False,
        mesh=None,
        shard_axis: str = "batch",
        **kwargs,
    ):
        """Fused latent reverse chain + one decoder pass, one jit. Returns
        [B, image_size, image_size, C] in [0, 1]. ``mesh`` shards the batch
        over the ``data`` axis (latents and decode follow by propagation).
        ``return_frames``/``shard_axis='spatial'`` are pixel-family services
        that don't transfer (frames live in latent space; the spatial split
        would need factor-aware shardings) — they raise."""
        if return_frames:
            raise NotImplementedError(
                "LatentDiffusion.sample(return_frames=True): the trajectory "
                "lives in latent space; decode selected frames via "
                "decode_from_latent instead"
            )
        if shard_axis != "batch":
            raise NotImplementedError("LatentDiffusion mesh sampling shards batch only")
        key = key if key is not None else jax.random.PRNGKey(0)
        f = int(self.first_stage.downsample_factor)
        zshape = (batch_size, int(image_size) // f, int(image_size) // f, self.latent_channels)
        out_shape = (batch_size, int(image_size), int(image_size), int(self.channels))
        model_fn = self.get_model_fn()
        sampler = self.sampler
        fs_params = self.first_stage_params
        from ..parallel import mesh_cache_key, sample_shardings

        def build():
            def fn(params, key):
                z = sampler.p_sample_loop(model_fn, params, zshape, key, unnormalize=False)
                img = self.decode_from_latent(fs_params, z)
                return jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)

            if mesh is None:
                return jax.jit(fn)
            rep, out, _ = sample_shardings(mesh, out_shape, "batch")
            return jax.jit(fn, in_shardings=(rep, rep), out_shardings=out)

        params = self.ema_params if use_ema else self.params
        return self._jitted(
            "sample", build, zshape, self.scale_factor, mesh_cache_key(mesh)
        )(params, key)

    def interpolate(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        t: Optional[int] = None,
        lambd: float = 0.5,
        key: Optional[jax.Array] = None,
        **kwargs,
    ):
        """Reference interpolate semantics, in latent space: encode both
        endpoints, noise to step ``t``, lerp, re-denoise, decode → [0,1]."""
        assert x1.ndim == 4 and x2.ndim == 4 and x1.shape == x2.shape
        key = key if key is not None else jax.random.PRNGKey(0)
        t = self.timesteps - 1 if t is None else int(t)
        model_fn = self.get_model_fn()
        sampler = self.sampler
        fs_params = self.first_stage_params

        def build():
            def fn(params, x1, x2, key):
                k_e1, k_e2, k_n1, k_n2, k_chain = jax.random.split(key, 5)
                z1 = self.encode_to_latent(fs_params, x1, k_e1)
                z2 = self.encode_to_latent(fs_params, x2, k_e2)
                B = z1.shape[0]
                t_b = jnp.full((B,), t, dtype=jnp.int32)
                zt1 = sampler.q_sample(z1, t_b, jax.random.normal(k_n1, z1.shape, z1.dtype))
                zt2 = sampler.q_sample(z2, t_b, jax.random.normal(k_n2, z2.shape, z2.dtype))
                z = (1.0 - lambd) * zt1 + lambd * zt2
                z = sampler.p_sample_loop(
                    model_fn, params, z1.shape, k_chain, img=z, num_steps=t,
                    unnormalize=False,
                )
                img = self.decode_from_latent(fs_params, z)
                return jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)

            return jax.jit(fn)

        return self._jitted("interpolate", build, x1.shape, t, lambd, self.scale_factor)(
            self.params, x1, x2, key
        )

    def inpaint(self, *a, **k):
        raise NotImplementedError(
            "RePaint blends pixel-space ancestral steps with the known pixels; "
            "in latent space the mask does not factorize across the decoder — "
            "use a pixel-space DDPM for inpainting"
        )

    # ---- persistence ---------------------------------------------------------------
    def save_to(self, path: str) -> str:
        """Self-contained archive: U-Net weights + EMA + the frozen first
        stage (``aux_first_stage``) + its module config in extra."""
        fs_net = self.first_stage
        fs_cfg = {
            "_target_": "diffusion_model_nemo.modules.AutoencoderKL",
            "dim": int(fs_net.dim),
            "dim_mults": [int(m) for m in fs_net.dim_mults],
            "z_channels": int(fs_net.z_channels),
            "channels": int(fs_net.channels),
            "resnet_block_groups": int(fs_net.resnet_block_groups),
            "dropout": fs_net.dropout,
            "dtype": str(fs_net.dtype),
        }
        return ckpt_lib.save_archive(
            path,
            self.cfg,
            self.params,
            self.ema_params,
            extra={"model_class": type(self).__name__, "first_stage_config": fs_cfg},
            aux_weights={"first_stage": self.first_stage_params},
        )

    @classmethod
    def restore_from(cls, path: str, trainer=None, use_ema: bool = False):
        cfg, params, ema, extra = ckpt_lib.load_archive(path)
        aux = ckpt_lib.load_aux_weights(path)
        fs_cfg = (extra or {}).get("first_stage_config")
        if fs_cfg is None or "first_stage" not in aux:
            raise ValueError(
                f"{path} is not a LatentDiffusion archive (no embedded first stage)"
            )
        cfg = from_dict(cfg)
        cfg["first_stage"] = {"autoencoder": fs_cfg}  # module spec; weights below
        model = cls(cfg=cfg, trainer=trainer)
        model.first_stage_params = jax.tree.map(jnp.asarray, aux["first_stage"])
        model.params = jax.tree.map(jnp.asarray, ema if (use_ema and ema is not None) else params)
        model.ema_params = (
            jax.tree.map(jnp.asarray, ema) if ema is not None
            else jax.tree.map(jnp.copy, model.params)
        )
        logging.info(f"Model restored from : {path}")
        return model
