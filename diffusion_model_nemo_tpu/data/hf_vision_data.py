"""Vision data pipeline: HuggingFace datasets → host numpy → device.

Counterpart of the reference's HFVisionDataset + torchvision transforms
(diffusion_model_nemo/data/hf_vision_data.py), redesigned for TPU:

- the host side only decodes/resizes to **uint8 NHWC** numpy batches
  (key ``image`` + optional ``label``);
- normalization to [-1, 1] and random horizontal flip run **on device inside
  the jitted train step** (:func:`preprocess_batch`) — the north-star
  "on-device preprocessing";
- ``synthetic`` datasets provide an offline/egress-free path for tests and
  benchmarks.

Batch key parity: models consume ``pixel_values`` produced by
``preprocess_batch`` (same key the reference's transforms emit).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging
from .native import fast_stack

__all__ = [
    "HFVisionDataset",
    "FileVisionDataset",
    "SyntheticVisionDataset",
    "SyntheticAudioDataset",
    "DataLoader",
    "build_dataloader",
    "preprocess_batch",
    "get_transform",
    "get_reverse_transform",
]

_IMAGE_KEYS = ("image", "img")


def _resolve_image_key(columns) -> str:
    for key in _IMAGE_KEYS:
        if key in columns:
            return key
    raise ValueError(
        f"Could not retrieve image from the dataset. Tried {list(_IMAGE_KEYS)}, which "
        f"did not match dataset columns : {list(columns)}"
    )


class HFVisionDataset:
    """Wraps ``datasets.load_dataset(name, split)``; yields uint8 HWC arrays.

    Reference hf_vision_data.py:98-122 resolves the image column from
    ['image', 'img'] the same way.

    ``name`` may also be a local directory written by
    ``datasets.Dataset.save_to_disk`` (or a ``DatasetDict`` save) — loaded
    via ``load_from_disk`` with no hub round-trip, so real HF-formatted data
    works on zero-egress rigs. ``split`` selects the split of a saved
    ``DatasetDict``.
    """

    def __init__(self, name: str, split: str, cache_dir: Optional[str] = None, mode: str = "train"):
        assert mode in ("train", "test"), "Mode must be in train or test"
        self.dataset = self._load(str(name), split, cache_dir)
        self.image_key = _resolve_image_key(self.dataset.column_names)
        self.has_label = "label" in self.dataset.column_names
        self.mode = mode

    @staticmethod
    def _load(name: str, split, cache_dir):
        import os

        # A save_to_disk directory carries state.json (Dataset) or
        # dataset_dict.json (DatasetDict) at its root.
        if os.path.isdir(name) and (
            os.path.exists(os.path.join(name, "state.json"))
            or os.path.exists(os.path.join(name, "dataset_dict.json"))
        ):
            from datasets import load_from_disk

            ds = load_from_disk(name)
            if hasattr(ds, "column_names") and isinstance(ds.column_names, dict):
                # DatasetDict: pick the requested split.
                if split is None or split not in ds:
                    raise ValueError(
                        f"saved DatasetDict at {name} has splits {list(ds)}; "
                        f"set train_ds.split (got {split!r})"
                    )
                ds = ds[split]
            return ds
        from datasets import load_dataset

        return load_dataset(name, split=split, cache_dir=cache_dir)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ex = self.dataset[int(idx)]
        img = np.asarray(ex[self.image_key])
        if img.ndim == 2:
            img = img[:, :, None]
        out = {"image": img.astype(np.uint8)}
        if self.has_label:
            out["label"] = np.int32(ex["label"])
        return out


class FileVisionDataset:
    """Offline dataset from local files (``train_ds.name=file``): real data
    without network egress (HF ``load_dataset`` needs a hub round-trip even
    for cached sets in some modes; this path needs none).

    Accepted ``path`` values:

    - ``*.npz`` — arrays under ``image_key`` (+ optional ``label_key``);
    - ``*.npy`` — a single image array (no labels);
    - a directory of image files (png/jpg/jpeg/bmp), lazily PIL-decoded per
      item (parallel decode via ``DataLoader(num_workers=...)``), with an
      optional ``labels.npy`` aligned to the sorted file order and an
      optional ``captions.txt`` (one caption per line, same order) that is
      byte-tokenized when ``caption_len > 0`` — the real-data path for the
      text-conditional family.

    Image arrays may be NCHW or NHWC, uint8 or float in [0, 1] / [-1, 1] —
    normalized here to uint8 HWC like every other dataset.
    """

    _IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")

    def __init__(
        self,
        path: str,
        image_key: str = "images",
        label_key: str = "labels",
        mode: str = "train",
        caption_len: int = 0,
    ):
        from pathlib import Path

        p = Path(path)
        if not p.exists():
            raise FileNotFoundError(f"FileVisionDataset path does not exist: {path}")
        self._files = None
        self._images = None
        self._labels = None
        self._tokens = None
        if p.is_dir():
            self._files = sorted(
                f for f in p.iterdir() if f.suffix.lower() in self._IMG_EXTS
            )
            if not self._files:
                raise ValueError(f"No image files ({self._IMG_EXTS}) found under {path}")
            lbl = p / "labels.npy"
            if lbl.exists():
                self._labels = np.load(lbl).astype(np.int32)
                if len(self._labels) != len(self._files):
                    raise ValueError(
                        f"labels.npy has {len(self._labels)} entries for "
                        f"{len(self._files)} image files"
                    )
            cap = p / "captions.txt"
            if caption_len and cap.exists():
                lines = cap.read_text().splitlines()
                if len(lines) != len(self._files):
                    raise ValueError(
                        f"captions.txt has {len(lines)} lines for "
                        f"{len(self._files)} image files"
                    )
                from ..utils.text import ByteTokenizer

                self._tokens = ByteTokenizer(int(caption_len)).encode_batch(lines)
        elif p.suffix == ".npz":
            data = np.load(p)
            if image_key not in data:
                raise KeyError(
                    f"`{image_key}` not in {path} (has {list(data.keys())}); "
                    "set train_ds.image_key"
                )
            self._images = _to_uint8_nhwc(data[image_key])
            if label_key in data:
                self._labels = data[label_key].astype(np.int32).reshape(-1)
        elif p.suffix == ".npy":
            self._images = _to_uint8_nhwc(np.load(p))
        else:
            raise ValueError(f"Unsupported dataset file type: {path}")

    def __len__(self) -> int:
        return len(self._files) if self._files is not None else self._images.shape[0]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        i = int(idx)
        if self._files is not None:
            from PIL import Image

            img = np.asarray(Image.open(self._files[i]).convert("RGB"), dtype=np.uint8)
        else:
            img = self._images[i]
        out = {"image": img}
        if self._labels is not None:
            out["label"] = np.int32(self._labels[i])
        if self._tokens is not None:
            out["tokens"] = self._tokens[i]
        return out


def _to_uint8_nhwc(arr: np.ndarray) -> np.ndarray:
    """[N,...] images in any common layout/dtype → uint8 NHWC."""
    if arr.ndim == 3:  # [N, H, W] grayscale
        arr = arr[..., None]
    if arr.ndim != 4:
        raise ValueError(f"Expected [N,H,W,C] / [N,C,H,W] / [N,H,W] images, got {arr.shape}")
    # NCHW → NHWC when the channel-like axis is 1/3/4 and the last axis isn't.
    if arr.shape[1] in (1, 3, 4) and arr.shape[-1] not in (1, 3, 4):
        arr = np.transpose(arr, (0, 2, 3, 1))
    if arr.dtype != np.uint8:
        a = arr.astype(np.float32)
        if a.min() < -0.001:  # [-1, 1]
            a = (a + 1.0) * 127.5
        elif a.max() <= 1.001:  # [0, 1]
            a = a * 255.0
        arr = np.clip(np.round(a), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(arr)


class SyntheticVisionDataset:
    """Deterministic random uint8 images; offline stand-in for tests/bench."""

    def __init__(
        self,
        image_size: int = 32,
        channels: int = 3,
        num_classes: int = 10,
        length: int = 512,
        seed: int = 0,
        mode: str = "train",
        caption_len: int = 0,
    ):
        self.image_size = image_size
        self.channels = channels
        self.num_classes = num_classes
        self.length = length
        self.rng = np.random.RandomState(seed)
        self._images = self.rng.randint(
            0, 256, size=(min(length, 512), image_size, image_size, channels), dtype=np.uint8
        )
        self._labels = self.rng.randint(0, num_classes, size=(min(length, 512),)).astype(np.int32)
        # caption_len > 0: deterministic label-derived captions for the
        # text-conditional family (offline text-to-image path).
        self._tokens = None
        if caption_len:
            from ..utils.text import ByteTokenizer

            tok = ByteTokenizer(int(caption_len))
            self._tokens = tok.encode_batch(
                [f"a photo of class {int(l)}" for l in self._labels]
            )

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        i = int(idx) % self._images.shape[0]
        out = {"image": self._images[i], "label": self._labels[i]}
        if self._tokens is not None:
            out["tokens"] = self._tokens[i]
        return out


class SyntheticAudioDataset:
    """Deterministic random waveforms (sums of sinusoids + noise) for
    offline vocoder tests/benchmarks; yields {'audio': float32 [T] in [-1,1]}."""

    def __init__(self, segment_length: int = 7200, length: int = 256, seed: int = 0, mode: str = "train"):
        self.segment_length = segment_length
        self.length = length
        rng = np.random.RandomState(seed)
        t = np.arange(segment_length) / 24000.0
        n_cached = min(length, 64)
        waves = []
        for i in range(n_cached):
            f0 = rng.uniform(80, 400)
            w = sum(
                rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6.28))
                for k in range(4)
            )
            w = w + rng.randn(segment_length) * 0.01
            waves.append((w / (np.abs(w).max() + 1e-6) * 0.95).astype(np.float32))
        self._waves = np.stack(waves)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int):
        return {"audio": self._waves[int(idx) % self._waves.shape[0]]}


class DataLoader:
    """Host-side batcher: shuffle, drop-remainder, numpy collate.

    Replaces torch DataLoader; batches are contiguous numpy arrays ready for
    a single host→device transfer (optionally sharded by the Trainer).

    ``num_workers`` (the reference YAML field, unet_small.yaml:19) maps to a
    thread pool over the per-item fetch/decode/resize — PIL decode and numpy
    copies release the GIL, so threads parallelize real decode work without
    torch's worker *processes* (no IPC, no tensor pickling). ``pin_memory``
    is accepted for config parity and ignored: host→TPU transfers don't
    stage through pinned CUDA buffers. Measured (examples/bench_loader.py):
    CPU-bound decode gains from workers only on multi-core hosts; on a
    1-vCPU host serial already sustains ~16k CIFAR PNGs/sec (~8× the dim-32
    train step rate) and workers should stay 0.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        image_size: Optional[int] = None,
        num_workers: int = 0,
        pin_memory: bool = False,  # parity no-op
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.image_size = image_size
        self.num_workers = max(int(num_workers or 0), 0)
        # Multi-host data sharding: each process reads a disjoint strided
        # slice of the (identically-shuffled) index order; batch_size is
        # per-process. Defaults make single-process the trivial special case.
        self.process_index = jax.process_index() if process_index is None else int(process_index)
        self.process_count = jax.process_count() if process_count is None else int(process_count)
        self._pool = None
        self._epoch = 0
        self._skip = 0  # batches to skip at the start of the next epoch

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers, thread_name_prefix="data-worker"
            )
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _resize(self, img: np.ndarray) -> np.ndarray:
        if self.image_size is None or img.shape[0] == self.image_size:
            return img
        from PIL import Image

        arr = img[..., 0] if img.shape[-1] == 1 else img
        pil = Image.fromarray(arr).resize((self.image_size, self.image_size), Image.BILINEAR)
        out = np.asarray(pil, dtype=np.uint8)
        if out.ndim == 2:
            out = out[:, :, None]
        return out

    def set_position(self, epoch: int, batch_offset: int) -> None:
        """Fast-forward the data stream for deterministic resume.

        Iteration order is a pure function of (seed, epoch, batch index) —
        the shuffle is epoch-seeded — so positioning costs nothing: the next
        ``__iter__`` replays epoch ``epoch`` and starts at ``batch_offset``
        (skipped batches are never fetched or decoded). Subsequent epochs
        start at 0 as usual. The Trainer derives the position from the
        resumed step, making a resumed run consume exactly the batches an
        uninterrupted run would (the reference loses data order on resume —
        PTL restarts its DataLoader from scratch).
        """
        self._epoch = int(epoch)
        self._skip = int(batch_offset)

    def _fetch(self, idx) -> Dict[str, np.ndarray]:
        item = self.dataset[idx]
        if "image" in item:
            item = dict(item)
            item["image"] = self._resize(item["image"])
        return item

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count > 1:  # same shuffle everywhere, disjoint slices
            order = order[self.process_index :: self.process_count]
        self._epoch += 1
        skip, self._skip = self._skip, 0

        nb = len(self)
        for b in range(skip, nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self.num_workers > 0:
                items = list(self._executor().map(self._fetch, idxs))
            else:
                items = [self._fetch(i) for i in idxs]
            yield {key: fast_stack([it[key] for it in items]) for key in items[0]}


def build_dataloader(cfg, mode: str) -> DataLoader:
    """Build from a reference-style ``train_ds``/``test_ds`` config block
    (name/split/cache_dir/batch_size/shuffle...)."""
    name = cfg.get("name")
    if name == "synthetic_audio":
        dataset = SyntheticAudioDataset(
            segment_length=int(cfg.get("segment_length", 7200)),
            length=int(cfg.get("length", 256)),
            mode=mode,
        )
    elif name == "synthetic" or str(name).startswith("synthetic"):
        dataset = SyntheticVisionDataset(
            image_size=int(cfg.get("image_size", 32)),
            channels=int(cfg.get("channels", 3)),
            num_classes=int(cfg.get("num_classes", 10) or 10),
            length=int(cfg.get("length", 512)),
            mode=mode,
            caption_len=int(cfg.get("caption_len", 0) or 0),
        )
    elif name == "file":
        dataset = FileVisionDataset(
            path=str(cfg.get("path")),
            image_key=str(cfg.get("image_key", "images")),
            label_key=str(cfg.get("label_key", "labels")),
            mode=mode,
            caption_len=int(cfg.get("caption_len", 0) or 0),
        )
    else:
        dataset = HFVisionDataset(
            name=name, split=cfg.get("split"), cache_dir=cfg.get("cache_dir"), mode=mode
        )
    logging.info(f"Built {mode} dataset `{name}` with {len(dataset)} examples")
    return DataLoader(
        dataset,
        batch_size=int(cfg.get("batch_size", 32)),
        shuffle=bool(cfg.get("shuffle", mode == "train")),
        seed=int(cfg.get("seed", 0)),
        image_size=cfg.get("resize_to"),
        num_workers=int(cfg.get("num_workers", 0) or 0),
        pin_memory=bool(cfg.get("pin_memory", False)),
    )


def preprocess_batch(
    batch: Dict[str, jnp.ndarray], key: Optional[jax.Array] = None, train: bool = True
) -> Dict[str, jnp.ndarray]:
    """On-device preprocessing inside the jitted step: uint8 → [-1, 1] floats,
    plus random horizontal flip when training (reference transforms,
    hf_vision_data.py:13-18, moved from host to TPU)."""
    x = batch["image"].astype(jnp.float32) / 127.5 - 1.0
    if train and key is not None:
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    out = {"pixel_values": x}
    if "label" in batch:
        out["label"] = batch["label"].astype(jnp.int32)
    if "tokens" in batch:
        out["tokens"] = batch["tokens"].astype(jnp.int32)
    return out


def get_transform(image_size: int, scale: bool = True, center_crop: bool = False):
    """Host-side image transform: resize (+optional center crop) → float HWC,
    optionally scaled to [-1, 1] (reference hf_vision_data.py:57-72).

    The training path normalizes on device instead (preprocess_batch); this
    exists for eval/interpolation scripts that prepare individual images.
    """

    def transform(img) -> np.ndarray:
        from PIL import Image

        if isinstance(img, np.ndarray):
            arr = img[..., 0] if (img.ndim == 3 and img.shape[-1] == 1) else img
            img = Image.fromarray(arr)
        w, h = img.size
        if center_crop:
            img = img.resize(
                (max(image_size, int(image_size * w / h)), max(image_size, int(image_size * h / w))),
                Image.BILINEAR,
            )
            w, h = img.size
            left, top = (w - image_size) // 2, (h - image_size) // 2
            img = img.crop((left, top, left + image_size, top + image_size))
        else:
            img = img.resize((image_size, image_size), Image.BILINEAR)
        out = np.asarray(img, dtype=np.float32) / 255.0
        if out.ndim == 2:
            out = out[:, :, None]
        if scale:
            out = out * 2.0 - 1.0
        return out

    return transform


def get_reverse_transform(inverse_scale: bool = True, uint: bool = False):
    """[-1,1] (or [0,1]) device array → HWC numpy/PIL-ready
    (reference hf_vision_data.py:75-95)."""

    def reverse(t):
        t = np.asarray(t)
        if inverse_scale:
            t = (t + 1.0) / 2.0
        t = t * 255.0
        if uint:
            t = np.clip(t, 0, 255).astype(np.uint8)
        return t

    return reverse
