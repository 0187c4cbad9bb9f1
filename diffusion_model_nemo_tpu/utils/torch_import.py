"""Import reference (PyTorch/NeMo) U-Net checkpoints into this framework.

The migration path for a user of ``titu1994/diffusion_model_nemo``: their
trained torch ``state_dict`` (or full ``.nemo`` archive) converts into this
framework's Flax parameter tree, after which every sampler/server/eval
surface here works on the trained weights. The key correspondence follows
the reference module layout (reference modules/unet.py:41-121 — ``downs.N``
ModuleLists of [block1, block2, Residual(PreNorm(attn)), down/upsample],
``time_mlp`` Sequential, ``final_conv`` Sequential) and the torch->NHWC
weight transforms are the ones proven by the lockstep parity tests
(tests/test_torch_parity_unet.py): conv OIHW->HWIO, dense transpose,
ConvTranspose2d IOHW->HWIO with spatial flip.

The converter is template-driven: it walks OUR initialized parameter tree,
derives each leaf's torch key by rule, and fails loudly listing anything
missing/mismatched — so a wrong-architecture checkpoint cannot silently
half-load.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

__all__ = ["convert_unet_state_dict", "export_unet_state_dict", "strip_prefix"]


def strip_prefix(state_dict: Dict[str, Any], prefix: str = "diffusion_model.") -> Dict[str, Any]:
    """Drop a NeMo/PTL attribute prefix (e.g. ``diffusion_model.``) when every
    parameter key carries it."""
    keys = [k for k in state_dict]
    if keys and all(k.startswith(prefix) for k in keys):
        return {k[len(prefix):]: v for k, v in state_dict.items()}
    return state_dict


# ---- leaf transforms ---------------------------------------------------------
def _conv(w):  # torch OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_transpose(w):  # torch ConvTranspose2d IOHW -> flax HWIO + spatial flip
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _dense(w):  # torch [out, in] -> flax [in, out]
    return np.ascontiguousarray(np.transpose(w))


def _identity(w):
    return np.asarray(w)


def _head_map(head: str, order: str) -> Tuple[str, str]:
    """Map our top-level module name -> (torch prefix, block kind).

    kinds: resblock | attn | conv | dense | norm | embed | upsample | downsample
    """
    m = re.fullmatch(r"down_(\d+)_(block1|block2|attn|downsample)", head)
    if m:
        i, part = m.groups()
        idx = {"block1": "0", "block2": "1", "attn": "2.fn", "downsample": "3"}[part]
        kind = {"block1": "resblock", "block2": "resblock",
                "attn": "attn", "downsample": "downsample"}[part]
        return f"downs.{i}.{idx}", kind
    m = re.fullmatch(r"up_(\d+)_(block1|block2|attn|upsample)", head)
    if m:
        i, part = m.groups()
        idx = {"block1": "0", "block2": "1", "attn": "2.fn", "upsample": "3"}[part]
        kind = {"block1": "resblock", "block2": "resblock",
                "attn": "attn", "upsample": "upsample"}[part]
        return f"ups.{i}.{idx}", kind
    if head in ("mid_block1", "mid_block2"):
        return head, "resblock"
    if head == "mid_attn":
        return "mid_attn.fn", "attn"
    if head == "init_conv":
        return "init_conv", "conv"
    if head == "time_dense0":
        return "time_mlp.1", "dense"
    if head == "time_dense1":
        return "time_mlp.3", "dense"
    if head == "class_embed":
        return "class_embed", "embed"
    m = re.fullmatch(r"film_(\d+)", head)
    if m:  # WaveGradUNet FiLM modules (reference unet.py:204-210)
        return f"films.{m.group(1)}", "film"
    # final Sequential(block, [GN, SiLU,] conv) — reference unet.py:112-117
    if head == "final_block":
        return "final_conv.0", "resblock"
    if head == "final_norm":
        return "final_conv.1", "norm"
    if head == "final_conv":
        return ("final_conv.3" if order == "bn_act_conv" else "final_conv.1"), "conv"
    raise KeyError(f"no torch mapping for module {head!r}")


def _leaf_rules(
    kind: str, rest: str, use_convnext: bool, linear_attn: bool = True
) -> Tuple[str, Callable]:
    """Map our sub-path within a block -> (torch suffix, transform)."""
    CONV = {"kernel": ("weight", _conv), "bias": ("bias", _identity)}
    DENSE = {"kernel": ("weight", _dense), "bias": ("bias", _identity)}
    NORM = {"scale": ("weight", _identity), "bias": ("bias", _identity)}

    parts = rest.split("/")
    leaf = parts[-1]
    sub = "/".join(parts[:-1])

    if kind == "conv":
        return CONV[leaf][0], CONV[leaf][1]
    if kind == "dense":
        t, f = DENSE[leaf]
        return t, f
    if kind == "norm":
        t, f = NORM[leaf]
        return t, f
    if kind == "embed":
        assert leaf == "embedding"
        return "weight", _identity
    if kind in ("downsample", "upsample"):
        # torch Down/Upsample IS the (transpose) conv (reference utils.py:77-82)
        assert sub == "conv"
        if kind == "downsample":
            return CONV[leaf][0], CONV[leaf][1]
        return ("weight", _conv_transpose) if leaf == "kernel" else ("bias", _identity)
    if kind == "film":
        # signal_conv is Sequential(conv, LeakyReLU) -> .0; scale/shift plain
        # convs (reference parts/film.py:31-56)
        table = {"signal_conv": "signal_conv.0", "scale_conv": "scale_conv",
                 "shift_conv": "shift_conv"}
        if sub in table:
            return f"{table[sub]}.{CONV[leaf][0]}", CONV[leaf][1]
        raise KeyError(f"film sub-path {rest!r}")
    if kind == "attn":
        # Residual(PreNorm(attn)): norm on the PreNorm, fn.* on the attention.
        if sub == "norm":
            return f"norm.{NORM[leaf][0]}", NORM[leaf][1]
        if sub == "attn/to_qkv":
            return "fn.to_qkv.weight", _conv  # bias-free 1x1
        if sub == "attn/to_out":
            # linear attn: Sequential(conv, GN) -> to_out.0; full attn: bare
            # conv -> to_out (reference mha.py:14 vs :40-42)
            t = "fn.to_out.0" if linear_attn else "fn.to_out"
            return f"{t}.{CONV[leaf][0]}", CONV[leaf][1]
        if sub == "attn/out_norm":  # linear attention's output GroupNorm
            return f"fn.to_out.1.{NORM[leaf][0]}", NORM[leaf][1]
        raise KeyError(f"attn sub-path {rest!r}")
    if kind == "resblock":
        if use_convnext:
            table = {
                "ds_conv": "ds_conv", "net_conv0": "net.1", "net_conv1": "net.4",
                "res_conv": "res_conv",
            }
            norm_table = {"net_norm0": "net.0", "net_norm1": "net.3"}
            if sub == "mlp":
                return f"mlp.1.{DENSE[leaf][0]}", DENSE[leaf][1]
            if sub in norm_table:
                return f"{norm_table[sub]}.{NORM[leaf][0]}", NORM[leaf][1]
            if sub in table:
                return f"{table[sub]}.{CONV[leaf][0]}", CONV[leaf][1]
            raise KeyError(f"convnext sub-path {rest!r}")
        if sub == "mlp":
            return f"mlp.1.{DENSE[leaf][0]}", DENSE[leaf][1]
        if sub in ("block1/proj", "block2/proj", "res_conv"):
            t = sub.replace("/", ".")
            return f"{t}.{CONV[leaf][0]}", CONV[leaf][1]
        if sub in ("block1/norm", "block2/norm"):
            t = sub.replace("/", ".")
            return f"{t}.{NORM[leaf][0]}", NORM[leaf][1]
        raise KeyError(f"resblock sub-path {rest!r}")
    raise KeyError(f"unknown kind {kind!r}")


def convert_unet_state_dict(
    state_dict: Dict[str, Any],
    params_template: Dict[str, Any],
    use_convnext: bool = False,
    resnet_block_order: str = "bn_act_conv",
    drop_dead_films: bool = False,
) -> Dict[str, Any]:
    """Convert a reference torch ``state_dict`` (prefix already stripped) into
    a parameter tree matching ``params_template`` (an initialized Flax params
    dict for the same architecture). Raises ValueError listing every problem
    if keys are missing or shapes mismatch."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}

    errors: List[str] = []
    used = set()

    def build(tree: Dict[str, Any], head: str, rest_prefix: str = "") -> Dict[str, Any]:
        out = {}
        for k, v in tree.items():
            path = f"{rest_prefix}{k}"
            if isinstance(v, dict):
                out[k] = build(v, head, path + "/")
                continue
            try:
                prefix, kind = _head_map(head, resnet_block_order)
                suffix, transform = _leaf_rules(
                    kind, path, use_convnext, linear_attn=(head != "mid_attn")
                )
                torch_key = f"{prefix}.{suffix}"
            except KeyError as e:
                errors.append(f"{head}/{path}: no mapping rule ({e})")
                out[k] = v
                continue
            if torch_key not in sd:
                errors.append(f"{head}/{path}: torch key {torch_key!r} not found")
                out[k] = v
                continue
            arr = transform(sd[torch_key])
            used.add(torch_key)
            if tuple(arr.shape) != tuple(np.shape(v)):
                errors.append(
                    f"{head}/{path}: shape {arr.shape} != expected {np.shape(v)} "
                    f"(torch key {torch_key!r})"
                )
                out[k] = v
                continue
            out[k] = arr.astype(np.asarray(v).dtype)
        return out

    result = {}
    for head, sub in params_template.items():
        if isinstance(sub, dict):
            result[head] = build(sub, head)
        else:  # top-level leaf (init_conv etc. are dicts in flax; none expected)
            errors.append(f"unexpected top-level leaf {head}")
            result[head] = sub

    unused = sorted(set(sd) - used)
    # torch buffers (none for GN) or extra heads are suspicious: surface them.
    unused = [k for k in unused if not k.endswith("num_batches_tracked")]
    if drop_dead_films:
        # The reference WaveGradUNet constructs up-path FiLMs its forward
        # never calls (unet.py:206-209 vs :211-266); their weights carry no
        # information and are not created here.
        unused = [k for k in unused if not re.match(r"films\.\d+\.", k)]
    if unused:
        errors.append(f"unconsumed torch keys: {unused[:8]}{'…' if len(unused) > 8 else ''}")
    if errors:
        raise ValueError("torch checkpoint import failed:\n  " + "\n  ".join(errors))
    return result


# ---- export (the inverse direction) ------------------------------------------
# Each forward transform's exact inverse — export(import(x)) and
# import(export(x)) are both identities, which the round-trip tests pin.
def _conv_inv(w):  # flax HWIO -> torch OIHW
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _conv_transpose_inv(w):  # flax HWIO + spatial flip -> torch IOHW
    return np.ascontiguousarray(np.transpose(np.asarray(w)[::-1, ::-1], (2, 3, 0, 1)))


def _dense_inv(w):  # flax [in, out] -> torch [out, in]
    return np.ascontiguousarray(np.transpose(w))


_INVERSE: Dict[Callable, Callable] = {
    _conv: _conv_inv,
    _conv_transpose: _conv_transpose_inv,
    _dense: _dense_inv,
    _identity: _identity,
}


def export_unet_state_dict(
    params: Dict[str, Any],
    use_convnext: bool = False,
    resnet_block_order: str = "bn_act_conv",
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Convert a Flax U-Net parameter tree into a reference-layout torch
    ``state_dict`` (numpy float32 values keyed by the reference's module
    paths) — the exact inverse of :func:`convert_unet_state_dict`, using the
    SAME key-derivation rules, so the two functions round-trip bitwise.

    The migration path back OUT of this framework: weights trained here load
    into the reference's torch ``Unet``/``WaveGradUNet`` with
    ``load_state_dict`` (reference modules/unet.py:41-121). A reference
    WaveGradUNet additionally constructs up-path FiLM modules its forward
    never calls (unet.py:206-209); this tree never created them, so load
    WaveGrad exports with ``strict=False`` (the missing keys are the dead
    modules — they carry no information).

    ``prefix`` is prepended to every key (e.g. ``"diffusion_model."`` to
    drop the result into a NeMo/PTL checkpoint's attribute namespace).
    """
    errors: List[str] = []
    out: Dict[str, np.ndarray] = {}

    def walk(tree: Dict[str, Any], head: str, rest_prefix: str = "") -> None:
        for k, v in tree.items():
            path = f"{rest_prefix}{k}"
            if isinstance(v, dict):
                walk(v, head, path + "/")
                continue
            try:
                head_prefix, kind = _head_map(head, resnet_block_order)
                suffix, transform = _leaf_rules(
                    kind, path, use_convnext, linear_attn=(head != "mid_attn")
                )
            except KeyError as e:
                errors.append(f"{head}/{path}: no mapping rule ({e})")
                continue
            torch_key = f"{prefix}{head_prefix}.{suffix}"
            if torch_key in out:
                errors.append(f"{head}/{path}: duplicate torch key {torch_key!r}")
                continue
            out[torch_key] = _INVERSE[transform](
                np.asarray(v, dtype=np.float32)
            )

    for head, sub in params.items():
        if isinstance(sub, dict):
            walk(sub, head)
        else:
            errors.append(f"unexpected top-level leaf {head}")
    if errors:
        raise ValueError("torch checkpoint export failed:\n  " + "\n  ".join(errors))
    return out
