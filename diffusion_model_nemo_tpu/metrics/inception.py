"""InceptionV3-pool3 feature extractor (standard FID) in Flax, NHWC.

The reference computes no FID (SURVEY §6), but the north star is FID parity,
which needs the *standard* extractor: InceptionV3 up to the 2048-dim pool3
features (Heusel et al. 2017). This is a from-scratch TPU-native (NHWC,
jit-friendly, bf16-capable) implementation of the torchvision
``inception_v3`` topology with the pytorch-fid variant switches:

- ``fid_variant=True`` (default): the 3×3 average pools inside the A/C/E
  blocks exclude padding from the divisor (``count_include_pad=False``) and
  the last E block (Mixed_7c) uses a max-pool branch — matching the
  TF "pt_inception-2015-12-05" graph every published FID uses.
- ``fid_variant=False``: plain torchvision semantics.

Weights are NOT bundled (zero-egress environment). Load them from a local
file via :func:`load_inception_variables` — either a torch ``state_dict``
checkpoint (``.pt/.pth/.bin``, torchvision or pytorch-fid naming; the FC /
AuxLogits heads are ignored) or a flat ``.npz`` with the same key names.
Submodule names here mirror the torch names exactly so the conversion is a
pure layout transpose (OIHW → HWIO).

Without weights the extractor runs with seeded random parameters — a valid
*relative* metric (random-feature Fréchet distance) for regression tracking,
clearly labeled NOT comparable to published Inception FID numbers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

__all__ = [
    "InceptionV3",
    "load_inception_variables",
    "flax_to_torch_state_dict",
    "torch_state_dict_to_flax",
    "inception_feature_fn",
    "INCEPTION_FEATURE_DIM",
]

INCEPTION_FEATURE_DIM = 2048
_BN_EPS = 1e-3


def _avg_pool_3x3_same(x: jnp.ndarray, count_include_pad: bool) -> jnp.ndarray:
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=count_include_pad,
    )


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class BasicConv2d(nn.Module):
    """Conv (no bias) + BatchNorm(eps=1e-3, frozen stats) + ReLU."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=_BN_EPS, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", **d)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", **d)(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2", **d)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **d)(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", **d)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3", **d)(b3)
        bp = _avg_pool_3x3_same(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", **d)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3", **d)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **d)(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", **d)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3", **d)(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))  # (1,7) kernel
        p71 = ((3, 3), (0, 0))  # (7,1) kernel
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", **d)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", **d)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2", **d)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3", **d)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", **d)(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2", **d)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3", **d)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4", **d)(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5", **d)(bd)
        bp = _avg_pool_3x3_same(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **d)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", **d)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2", **d)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", **d)(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2", **d)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3", **d)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4", **d)(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # Mixed_7b: avg; Mixed_7c (FID variant): max
    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = dict(dtype=self.dtype)
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", **d)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", **d)(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a", **d)(b3),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b", **d)(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", **d)(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2", **d)(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a", **d)(bd),
                BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b", **d)(bd),
            ],
            axis=-1,
        )
        if self.pool_type == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_same(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", **d)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Inception v3 trunk → 2048-dim pool3 features (no aux head).

    Input: float NHWC in [-1, 1] at 299×299 (use :meth:`preprocess`).
    ``num_logits > 0`` adds the classifier head (torchvision ``fc``; 1000
    classes for torchvision checkpoints, 1008 for the TF pt_inception one)
    and makes ``__call__`` return ``(pool3, logits)`` — needed for the
    Inception Score (metrics/scores.py). 0 keeps the FID-only trunk.
    """

    fid_variant: bool = True
    dtype: Any = jnp.float32
    num_logits: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = dict(dtype=self.dtype)
        fv = self.fid_variant
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3", **d)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", **d)(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3", **d)(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", **d)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", **d)(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, fid_variant=fv, name="Mixed_5b", **d)(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5c", **d)(x)
        x = InceptionA(64, fid_variant=fv, name="Mixed_5d", **d)(x)
        x = InceptionB(name="Mixed_6a", **d)(x)
        x = InceptionC(128, fid_variant=fv, name="Mixed_6b", **d)(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6c", **d)(x)
        x = InceptionC(160, fid_variant=fv, name="Mixed_6d", **d)(x)
        x = InceptionC(192, fid_variant=fv, name="Mixed_6e", **d)(x)
        x = InceptionD(name="Mixed_7a", **d)(x)
        x = InceptionE(pool_type="avg", fid_variant=fv, name="Mixed_7b", **d)(x)
        x = InceptionE(
            pool_type="max" if fv else "avg", fid_variant=fv, name="Mixed_7c", **d
        )(x)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool3 [B, 2048]
        if self.num_logits:
            # torchvision applies Dropout before fc — identity in eval mode.
            logits = nn.Dense(self.num_logits, dtype=jnp.float32, name="fc")(feats)
            return feats, logits
        return feats

    @staticmethod
    def preprocess(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
        """uint8 (or [0,1]/[0,255] float) NHWC → bilinear-resized 299×299
        float in [-1, 1], grayscale replicated to 3 channels — the
        pytorch-fid input convention."""
        x = jnp.asarray(images).astype(jnp.float32)
        if jnp.asarray(images).dtype == jnp.uint8:
            x = x / 255.0
        else:  # float input: [0, 255] vs [0, 1] resolved at runtime
            x = jnp.where(x.max() > 1.5, x / 255.0, x)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        B, H, W, C = x.shape
        if (H, W) != (size, size):
            x = jax.image.resize(x, (B, size, size, C), method="bilinear")
        return x * 2.0 - 1.0


# --------------------------------------------------------------- weights ----
def _torch_entry_to_flax(key: str, value: np.ndarray, keep_fc: bool = False):
    """One torch state_dict entry → (collection, path, array) or None."""
    parts = key.split(".")
    if parts[0] == "fc":
        if not keep_fc:
            return None
        if parts[-1] == "weight":  # torch Linear [out, in] → flax [in, out]
            return "params", ("fc", "kernel"), np.transpose(value, (1, 0))
        return "params", ("fc", "bias"), np.asarray(value)
    if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
        return None
    leaf = parts[-1]
    owner = parts[-2]
    if owner == "conv" and leaf == "weight":
        return "params", (*parts[:-1], "kernel"), np.transpose(value, (2, 3, 1, 0))
    if owner == "bn":
        mapped = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                  "running_mean": ("batch_stats", "mean"),
                  "running_var": ("batch_stats", "var")}.get(leaf)
        if mapped is None:
            raise KeyError(f"Unrecognized BN entry: {key}")
        coll, name = mapped
        return coll, (*parts[:-1], name), np.asarray(value)
    raise KeyError(f"Unrecognized state_dict entry: {key}")


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray], keep_fc: bool = False
) -> Dict[str, Any]:
    """torchvision/pytorch-fid InceptionV3 state_dict → flax variables
    {'params': ..., 'batch_stats': ...} (OIHW → HWIO; aux head dropped;
    the fc classifier kept only with ``keep_fc`` — Inception Score path)."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        entry = _torch_entry_to_flax(key, np.asarray(value), keep_fc=keep_fc)
        if entry is None:
            continue
        coll, path, arr = entry
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr)
    return out


def flax_to_torch_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (tests/export): flax variables → torch-style flat dict."""
    sd: Dict[str, np.ndarray] = {}

    def walk(node, path, coll):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,), coll)
                continue
            arr = np.asarray(v)
            if k == "kernel" and arr.ndim == 2:  # fc head: [in, out] → [out, in]
                sd[".".join(path) + ".weight"] = np.transpose(arr, (1, 0))
            elif k == "kernel":  # path ends with "conv"
                sd[".".join(path) + ".weight"] = np.transpose(arr, (3, 2, 0, 1))
            elif coll == "params":  # path ends with "bn"
                sd[".".join(path) + "." + {"scale": "weight", "bias": "bias"}[k]] = arr
            else:
                sd[".".join(path) + "." + {"mean": "running_mean", "var": "running_var"}[k]] = arr

    walk(variables["params"], (), "params")
    walk(variables["batch_stats"], (), "batch_stats")
    return sd


def load_inception_variables(weights_path: str, keep_fc: bool = False) -> Dict[str, Any]:
    """Load extractor weights from a local file: a torch checkpoint
    (``.pt/.pth/.bin``: a state_dict, or a dict holding one under
    'state_dict') or a flat ``.npz`` with torch-style keys."""
    p = Path(weights_path)
    if not p.exists():
        raise FileNotFoundError(f"Inception weights not found: {weights_path}")
    if p.suffix == ".npz":
        sd = dict(np.load(p))
    else:
        import torch

        obj = torch.load(str(p), map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        sd = {k: v.numpy() for k, v in obj.items()}
    return torch_state_dict_to_flax(sd, keep_fc=keep_fc)


def inception_feature_fn(
    weights_path: Optional[str] = None,
    batch_size: int = 64,
    fid_variant: bool = True,
    dtype: Any = jnp.float32,
    with_logits: bool = False,
) -> Callable[[np.ndarray], np.ndarray]:
    """Build ``feature_fn(images) -> [N, 2048]`` for :class:`FIDScorer`.

    With ``weights_path`` this is standard Inception FID; without, it runs
    seeded random weights (relative regression metric only) and the returned
    function carries ``using_random_weights=True`` so callers can label
    output honestly.

    ``with_logits=True`` adds the classifier head (one trunk pass serves
    both FID features and Inception-Score posteriors) and the function
    returns ``(features [N, 2048], probs [N, K])`` instead.
    """
    num_logits = 0
    if with_logits:
        num_logits = 1000  # torchvision head; overridden by checkpoint shape
    if weights_path:
        variables = load_inception_variables(weights_path, keep_fc=with_logits)
        if with_logits:
            fc = variables["params"].get("fc")
            if fc is None:
                raise ValueError(
                    f"with_logits=True but {weights_path} has no fc head "
                    "(Inception Score needs a classifier checkpoint)"
                )
            num_logits = int(fc["kernel"].shape[1])
        random_weights = False
        model = InceptionV3(fid_variant=fid_variant, dtype=dtype, num_logits=num_logits)
    else:
        model = InceptionV3(fid_variant=fid_variant, dtype=dtype, num_logits=num_logits)
        logging.warning(
            "No Inception weights provided (feature_weights_path unset): using "
            "SEEDED RANDOM weights. The resulting Fréchet distance is a valid "
            "relative metric but NOT comparable to published Inception FID."
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32))
        # flax's default lecun_normal halves activation variance at every
        # ReLU; through ~94 conv layers the pool3 features collapse to ~0 and
        # the "relative metric" stops discriminating anything. He-scale the
        # conv kernels (×√2, the ReLU-preserving gain) so random features
        # retain input-dependent variance.
        variables = jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf * np.sqrt(2.0)
            if any(getattr(k, "key", None) == "conv" for k in path)
            and leaf.ndim == 4
            else leaf,
            variables,
        )
        random_weights = True

    if with_logits:
        apply = jax.jit(
            lambda v, x: (lambda fl: (fl[0], jax.nn.softmax(fl[1], axis=-1)))(
                model.apply(v, InceptionV3.preprocess(x))
            )
        )

        def feature_fn(images: np.ndarray):
            images = np.asarray(images)
            feats, probs = [], []
            for i in range(0, images.shape[0], batch_size):
                f, p = apply(variables, images[i : i + batch_size])
                feats.append(np.asarray(f))
                probs.append(np.asarray(p))
            return np.concatenate(feats, axis=0), np.concatenate(probs, axis=0)

    else:
        apply = jax.jit(lambda v, x: model.apply(v, InceptionV3.preprocess(x)))

        def feature_fn(images: np.ndarray) -> np.ndarray:
            images = np.asarray(images)
            feats = []
            for i in range(0, images.shape[0], batch_size):
                chunk = images[i : i + batch_size]
                feats.append(np.asarray(apply(variables, chunk)))
            return np.concatenate(feats, axis=0)

    feature_fn.using_random_weights = random_weights
    feature_fn.feature_dim = INCEPTION_FEATURE_DIM
    feature_fn.num_logits = num_logits
    return feature_fn
