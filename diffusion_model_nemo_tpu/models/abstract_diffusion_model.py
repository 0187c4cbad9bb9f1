"""Base model: config-driven assembly, sampling services, bits/dim, export.

Replaces the reference's ``AbstractDiffusionModel(ModelPT)``
(diffusion_model_nemo/models/abstract_diffusion_model.py) and the NeMo
services it inherits:

- builds network / sampler / loss from ``_target_`` config blocks
- owns params + EMA params (explicit pytrees, not module state)
- ``change_sampler`` hot-swap with config persistence (reference :130-135) —
  re-instantiates the process and invalidates the jit cache (re-trace instead
  of Python-object mutation)
- exact discrete bits/dim as a ``lax.scan`` over all T timesteps (reference
  runs a tqdm Python loop of T network calls, :137-197)
- ``save_to`` / ``restore_from`` single-file archives (the ``.nemo``
  equivalent) and periodic sample-grid dumping during training.

Training steps are **pure functions** ``(params, batch, key, step) →
(loss, metrics)`` defined by subclasses; the Trainer jits them over the
device mesh.
"""

from __future__ import annotations

import datetime
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate
from ..config.yaml_config import Config, from_dict, to_yaml
from ..data.hf_vision_data import build_dataloader
from ..loss.variational_bound_loss import compute_variational_loss_terms
from ..ops.math import LOG2, mean_flattened, normal_kl, num_to_groups
from ..training import checkpoints as ckpt_lib
from ..utils import logging
from ..utils.image import save_image_grid

__all__ = ["AbstractDiffusionModel"]


class AbstractDiffusionModel:
    def __init__(self, cfg, trainer=None):
        self.cfg: Config = from_dict(cfg)
        self.trainer = trainer

        # Global geometry (reference abstract_diffusion_model.py:30-32)
        self.image_size = self.cfg.get("image_size")
        self.timesteps = self.cfg.get("timesteps")
        self.channels = self.cfg.get("channels", 3)

        self.save_and_sample_every = self.cfg.get("save_every", 1000)
        self._result_dir: Optional[Path] = None

        # Parameter state (owned here, not by a framework Trainer).
        self.params: Any = None
        self.ema_params: Any = None

        self._train_dl = None
        self._test_dl = None
        self._jit_cache: Dict[Any, Callable] = {}

    # ---- network plumbing -----------------------------------------------------
    def build_network(self):
        """Instantiate the flax module from cfg.diffusion_model."""
        net_cfg = dict(self.cfg.diffusion_model)
        net_cfg.pop("_target_", None)
        from ..config.registry import get_target

        target = get_target(str(self.cfg.diffusion_model["_target_"]))
        # flax dataclass fields: drop Nones that have non-None defaults handled inside
        if net_cfg.get("dim_mults") is not None:
            net_cfg["dim_mults"] = tuple(net_cfg["dim_mults"])
        return target(**net_cfg)

    def init_params(self, key: Optional[jax.Array] = None) -> Any:
        """Initialize network parameters (and EMA copy)."""
        if key is None:
            key = jax.random.PRNGKey(int(self.cfg.get("seed", 0)))
        s = self._example_spatial_size()
        x = jnp.zeros((1, s, s, self._example_input_channels()), jnp.float32)
        t = self._example_time()
        variables = self.diffusion_model.init(key, x, t, **self._example_network_kwargs())
        self.params = variables["params"]
        # real copy — params and ema are independently donated by the train step
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        n = sum(int(p.size) for p in jax.tree.leaves(self.params))
        logging.info(f"Initialized {type(self).__name__} with {n:,} parameters")
        return self.params

    def _example_time(self) -> jnp.ndarray:
        return jnp.zeros((1,), jnp.float32)

    def _example_network_kwargs(self) -> Dict[str, Any]:
        """Extra network-init kwargs for conditioned backbones (subclasses
        with sequence conditioning extend this)."""
        kwargs: Dict[str, Any] = {}
        if getattr(self.diffusion_model, "num_classes", None):
            kwargs["classes"] = jnp.zeros((1,), jnp.int32)
        return kwargs

    def _example_input_channels(self) -> int:
        """Channels of the network's image input (conditioned models — e.g.
        SR3's [x_t, upsampled-LR] concat — override)."""
        return int(self.channels)

    def _example_spatial_size(self) -> int:
        """Spatial size of the network's input (latent-space models — where
        the U-Net sees the downsampled latent, not the image — override)."""
        return int(self.image_size)

    def model_fn(self, params, x, t, classes=None, dropout_rng=None, aug_cond=None,
                 context=None):
        """Pure network application; subclasses may bind conditioning.

        ``dropout_rng`` activates dropout (training mode); inference is
        deterministic. ``aug_cond`` is the non-leaky augmentation descriptor
        (data/augment.py) for networks built with ``aug_dim > 0``;
        ``context`` is the sequence-conditioning input (token ids or float
        embeddings) for backbones built with ``context_dim > 0``."""
        kwargs = {}
        if classes is not None:
            kwargs["classes"] = classes
        if aug_cond is not None:
            kwargs["aug_cond"] = aug_cond
        if context is not None:
            kwargs["context"] = context
        rngs = None
        if dropout_rng is not None:
            kwargs["deterministic"] = False
            rngs = {"dropout": dropout_rng}
        return self.diffusion_model.apply({"params": params}, x, t, rngs=rngs, **kwargs)

    def get_model_fn(
        self,
        batch: Optional[Dict] = None,
        training: bool = False,
        key=None,
        aug_cond=None,
    ):
        """Returns ``model_fn(params, x, t)`` possibly bound to batch
        conditioning (reference ``get_diffusion_model``) and, when training,
        a dropout rng (and the augmentation descriptor, if any)."""
        dropout_rng = key if training else None
        return lambda params, x, t: self.model_fn(
            params, x, t, dropout_rng=dropout_rng, aug_cond=aug_cond
        )

    def forward(self, x_t, t, classes=None):
        """Reference-compatible convenience: apply the network with the
        model's current params (reference models expose ``forward(x_t, t,
        classes)``); pure code should use ``model_fn`` with explicit params."""
        return self.model_fn(self.params, x_t, t, classes=classes)

    # ---- abstract API -----------------------------------------------------------
    def training_step(self, params, batch, key, step):
        raise NotImplementedError()

    def sample(self, batch_size: int, image_size: int, key=None, **kwargs):
        raise NotImplementedError()

    def interpolate(self, x1, x2, t=None, lambd=0.5, **kwargs):
        raise NotImplementedError()

    # ---- data ---------------------------------------------------------------------
    def _setup_dataloader(self, cfg, mode: str):
        if cfg is None or cfg.get("name") is None:
            return None
        if str(cfg.get("name", "")).startswith("synthetic"):
            # synthetic datasets default to the model's geometry so eval
            # scripts can say just `dataset_name=synthetic`
            cfg = from_dict(cfg)
            cfg.setdefault("image_size", self.image_size)
            cfg.setdefault("channels", self.channels)
            if self.cfg.get("num_classes") is not None:
                # labels must stay inside the class-embedding table: an
                # out-of-range index reaches jnp.take's out-of-bounds FILL
                # mode, which fills NaN for floats → instant NaN loss
                cfg.setdefault("num_classes", int(self.cfg["num_classes"]))
        return build_dataloader(cfg, mode=mode)

    def setup_training_data(self, train_data_config):
        cfg = from_dict(train_data_config)
        if "shuffle" in cfg:
            cfg["shuffle"] = True
        self._train_dl = self._setup_dataloader(cfg, mode="train")

    def setup_test_data(self, test_data_config):
        cfg = from_dict(test_data_config)
        if "shuffle" in cfg:
            cfg["shuffle"] = False
        self._test_dl = self._setup_dataloader(cfg, mode="test")

    # Reference API name
    setup_multiple_test_data = setup_test_data

    def setup_validation_data(self, val_data_config):
        return None  # validation ignored, like the reference (:88-90)

    # ---- sampler hot-swap -----------------------------------------------------------
    def change_sampler(self, sampler_cfg) -> None:
        """Re-instantiate the sampler and persist its config into the model
        cfg so a restored model remembers it (reference :130-135)."""
        sampler_cfg = from_dict(sampler_cfg)
        self.sampler = instantiate(sampler_cfg)
        self.cfg["sampler"] = sampler_cfg
        self._jit_cache.clear()
        logging.info(f"Sampler changed to :\n{to_yaml(sampler_cfg)}")

    # ---- jit cache -----------------------------------------------------------------
    def _jitted(self, name: str, build: Callable, *cache_key) -> Callable:
        key = (name, getattr(self.sampler, "version", 0), *cache_key)
        if key not in self._jit_cache:
            self._jit_cache[key] = build()
        return self._jit_cache[key]

    # ---- sampling/IO services ---------------------------------------------------------
    def _prepare_output_dir(self) -> Path:
        if self._result_dir is None:
            timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
            results_dir = self.cfg.get("results_dir", f"./results/{timestamp}/")
            self._result_dir = Path(results_dir).absolute()
            self._result_dir.mkdir(exist_ok=True, parents=True)
        return self._result_dir

    def _save_image_step(self, batch_size: int, step: int, key=None):
        """Dump a grid of samples every ``save_every`` steps
        (reference :107-125). Process-0 only under multi-host. Returns the
        sampled images so the Trainer can forward them to TB/wandb."""
        if jax.process_index() != 0:
            return None
        out_dir = self._prepare_output_dir()
        milestone = step // max(int(self.save_and_sample_every), 1)
        key = key if key is not None else jax.random.PRNGKey(step)
        batches = num_to_groups(4, batch_size)
        all_imgs = []
        for idx, n in enumerate(batches):
            imgs = self.sample(batch_size=n, image_size=self.image_size, key=key)
            imgs = np.asarray(imgs if not isinstance(imgs, tuple) else imgs[0])
            save_path = str(out_dir / f"sample-{milestone}-{idx + 1}.png")
            save_image_grid(imgs, save_path, nrow=6)
            logging.info(f"Images saved at path : {save_path}")
            all_imgs.append(imgs)
        return np.concatenate(all_imgs) if all_imgs else None

    # ---- bits/dim ------------------------------------------------------------------------
    def calculate_bits_per_dimension(
        self,
        x_start: jnp.ndarray,
        params: Optional[Any] = None,
        key: Optional[jax.Array] = None,
        max_batch_size: int = 32,
        model_fn=None,
    ) -> Dict[str, jnp.ndarray]:
        """Exact discrete VLB bits/dim, fused as a scan over t = T-1…0.

        Per t: q_sample → q_posterior → p_mean_variance → VLB term; prior KL
        added at the end (reference abstract_diffusion_model.py:137-197).
        Returns {'total_bpd' [B], 'terms_bpd' [B, T], 'prior_bpd' [B]}.
        """
        params = params if params is not None else self.params
        key = key if key is not None else jax.random.PRNGKey(0)
        if max_batch_size > 0:
            x_start = x_start[: min(max_batch_size, x_start.shape[0])]
        model_fn = model_fn or self.get_model_fn()
        sampler = self.sampler
        T = sampler.timesteps
        B = x_start.shape[0]

        def build():
            def fn(params, x_start, key):
                ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

                def step(carry, t):
                    k = carry
                    k, sub = jax.random.split(k)
                    # scalar t: table lookups are dynamic-slices, not gathers
                    noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
                    x_t = sampler.q_sample(x_start, t, noise)
                    true_mean, true_log_var = sampler.q_posterior(x_start=x_start, x=x_t, t=t)
                    out = sampler.p_mean_variance(model_fn, params, x=x_t, t=t)
                    vb, _ = compute_variational_loss_terms(
                        samples=x_start,
                        model_mean=out.mean,
                        model_log_variance=jnp.broadcast_to(out.log_variance, out.mean.shape),
                        true_mean=true_mean,
                        true_log_variance_clipped=true_log_var,
                        t=t,
                    )
                    return k, vb

                _, terms = jax.lax.scan(step, key, ts)  # [T, B] (t descending)
                terms_bpd = terms[::-1].T  # [B, T] ascending t

                t_prior = jnp.full((B,), T - 1, dtype=jnp.int32)
                qt_mean, _, qt_log_var = sampler.q_mean_variance(x_start, t_prior)
                kl_prior = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
                prior_bpd = mean_flattened(kl_prior) / LOG2

                total_bpd = terms_bpd.sum(axis=1) + prior_bpd
                return {
                    "total_bpd": total_bpd,
                    "terms_bpd": terms_bpd,
                    "prior_bpd": prior_bpd,
                }

            return jax.jit(fn)

        return self._jitted("bpd", build, x_start.shape)(params, x_start, key)

    # ---- persistence -----------------------------------------------------------------------
    def save_to(self, path: str) -> str:
        """Single-file export: config + weights + EMA (``.nemo`` equivalent).

        Records the model class name so generic consumers (the serving
        daemon's ``restore_model_from_archive``) can restore without being
        told the family.
        """
        return ckpt_lib.save_archive(
            path,
            self.cfg,
            self.params,
            self.ema_params,
            extra={"model_class": type(self).__name__},
        )

    @classmethod
    def restore_from(cls, path: str, trainer=None, use_ema: bool = False):
        import os

        if not os.path.exists(str(path)):
            # not a path: maybe a LOCAL-hub model name (utils/hub.py) — this
            # makes every archive-taking CLI accept model_path=<hub name>
            from ..utils import hub as hub_lib

            resolved = hub_lib.resolve_model_name(str(path))
            if resolved is not None:
                logging.info(f"Resolved hub model {path!r} -> {resolved}")
                path = str(resolved)
        cfg, params, ema, _ = ckpt_lib.load_archive(path)
        model = cls(cfg=cfg, trainer=trainer)
        model.params = from_np(ema if (use_ema and ema is not None) else params)
        model.ema_params = from_np(ema) if ema is not None else jax.tree.map(jnp.copy, model.params)
        logging.info(f"Model restored from : {path}")
        return model

    def maybe_init_from_pretrained_checkpoint(self, cfg) -> None:
        """Warm-start weights from another archive if the config names one
        (reference train scripts' ``+init_from_nemo_model=``)."""
        cfg = from_dict(cfg)
        src = cfg.get("init_from_nemo_model") or cfg.get("init_from_model")
        if src:
            _, params, ema, _ = ckpt_lib.load_archive(src)
            self.params = from_np(params)
            self.ema_params = from_np(ema) if ema is not None else jax.tree.map(jnp.copy, self.params)
            logging.info(f"Model weights warm-started from : {src}")

    @classmethod
    def from_pretrained(cls, model_name: str, trainer=None, use_ema: bool = False, **_compat):
        """Hub-name loading surface (reference examples/*/test_*.py:83 falls
        back to NeMo's NGC hub when no local archive is given). On this
        zero-egress build the hub is a LOCAL directory of ``.dmn`` archives
        (``$DMN_MODEL_HUB``, default ``~/.cache/dmn_hub`` — utils/hub.py):
        an existing path restores directly; otherwise the name resolves in
        the hub; an unknown name fails loudly listing what IS installed
        instead of silently returning None."""
        import os

        from ..utils import hub as hub_lib

        if os.path.exists(str(model_name)):
            return cls.restore_from(str(model_name), trainer=trainer, use_ema=use_ema)
        resolved = hub_lib.resolve_model_name(str(model_name))
        if resolved is not None:
            return cls.restore_from(str(resolved), trainer=trainer, use_ema=use_ema)
        available = [m.pretrained_model_name for m in hub_lib.list_hub_models()]
        raise FileNotFoundError(
            f"{cls.__name__}.from_pretrained({model_name!r}): not a path and "
            f"not installed in the local hub {hub_lib.hub_dir()} "
            f"(installed: {available or 'none'}). Publish with "
            "model.publish_to_hub(name) or copy a .dmn archive into the hub "
            "directory; the reference itself publishes no checkpoints "
            "(list_available_models is None, reference "
            "abstract_diffusion_model.py:127-128)."
        )

    def publish_to_hub(self, model_name: str) -> str:
        """Save this model into the local hub under ``model_name`` so any
        process on the machine can ``from_pretrained(model_name)`` it."""
        import os
        import tempfile

        from ..utils import hub as hub_lib

        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, f"{model_name}.dmn")
            self.save_to(tmp)
            return str(hub_lib.publish_archive(tmp, model_name))

    @classmethod
    def list_available_models(cls):
        """Models installed in the LOCAL hub (the reference returns None —
        it publishes nothing; abstract_diffusion_model.py:127-128)."""
        from ..utils import hub as hub_lib

        return hub_lib.list_hub_models() or None


def from_np(tree):
    return jax.tree.map(jnp.asarray, tree)
