"""Batched sampling daemon: production serving around the cached-jit samplers.

Beyond the reference's CLI surface (its only serving story is the eval
scripts' one-shot PNG dumps, examples/ddpm/eval_ddpm.py) — this module turns
a trained archive into a long-lived service the way a TPU wants to be fed:

- **One compile, fixed shapes.** The sampling scan is jitted once at a fixed
  ``max_batch``; every device call runs exactly that shape (partial batches
  are padded and the excess images discarded). No dynamic shapes, no
  recompiles, no cold-start on the request path after warmup.
- **Dynamic request batching.** Concurrent requests coalesce into one device
  batch (linger window + size cap), so throughput tracks the chip's
  samples/sec/chip envelope rather than per-request latency × request count.
- **Single device owner.** One worker thread owns the TPU; HTTP threads only
  queue and wait. This keeps the dispatch pipeline serialized (the round-2
  lesson: a device sync per request from many threads destroys pipelining).

Endpoints (stdlib http.server; zero extra dependencies):
  GET  /healthz          → {"status": "ok", ...} after warmup
  GET  /stats            → request/batch/latency counters
  POST /sample           → JSON {"num_images": N, "seed": S?, "label": L?,
                                 "guidance_scale": W? (conditional models),
                                 "text": prompt? / "negative_text": anchor?
                                 (text-conditional archives — prompts are
                                 runtime data, so requests with DIFFERENT
                                 prompts coalesce into one device batch;
                                 only W is baked into the graph),
                           "format": "png"|"npy"} →
                           {"images": [b64-PNG, ...]} or raw .npy bytes
  POST /super_resolve    → (SR3 archives) JSON {"images_npy": b64 of an
                           np.save'd [N, h, w, C] array (uint8 or [0,1]
                           float), "seed": S?, "format": "png"|"npy"} →
                           super-resolved [N, h*s, w*s, C] outputs. SR3
                           archives serve ONLY this route (/sample needs no
                           input and is rejected); generation archives
                           reject it. Same batching machinery: requests
                           coalesce into one fixed-shape device batch,
                           padded rows are computed-and-discarded.
  POST /vocode           → (WaveGrad vocoder archives) JSON {"mel_npy": b64
                           of an np.save'd [N, F, n_mels] float log-mel
                           array, "seed": S?} → raw .npy [N, F·hop] float32
                           waveforms (format is always npy — audio has no
                           PNG form). F must equal the server's compiled
                           mel_frames (fixed shapes, one compile). Vocoder
                           archives serve ONLY this route.
  POST /edit             → (DDPM-family generation archives) JSON
                           {"images_npy": b64 of an np.save'd [N, H, W, C]
                           array (uint8 or [0,1] float) at the model's
                           image size, "strength": s in [0, 1],
                           "seed": S?, "format": "png"|"npy"} → SDEdit
                           image-to-image outputs (DDPM.edit — the input
                           noised to strength·T then re-denoised on the
                           ancestral chain). Each distinct strength is its
                           own cached jit; requests coalesce per strength.
"""

from __future__ import annotations

import base64
import binascii
import io
import json
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils import logging

__all__ = ["BatchingSampler", "SamplingServer", "serve"]


def _to_unit_float_images(images: np.ndarray, what: str) -> np.ndarray:
    """uint8 → [0, 1] floats; float inputs must already be in [0, 1].

    A float array in [0, 255] (a common client mistake) would silently pass
    every shape check and produce garbage outputs — reject it loudly with
    the fix spelled out (ADVICE r3)."""
    if images.dtype == np.uint8:
        return images.astype(np.float32) / 255.0
    images = images.astype(np.float32)
    if images.size and float(images.max()) > 1.5:
        raise ValueError(
            f"float {what} must be in [0, 1] (got max {float(images.max()):.3g}); "
            "divide by 255 or send uint8"
        )
    return images


@dataclass
class _Request:
    num_images: int
    seed: Optional[int]
    label: Optional[int]
    guidance_scale: Optional[float] = None
    images: Optional[np.ndarray] = None  # SR LR inputs / edit sources [n,h,w,C] in [0,1]
    mel: Optional[np.ndarray] = None  # vocoder mode: log-mel [n, F, n_mels]
    strength: Optional[float] = None  # edit requests: SDEdit strength in [0, 1]
    text: Optional[str] = None  # text archives: the prompt ("" / None = null context)
    neg_text: Optional[str] = None  # text archives: negative prompt (CFG anchor)
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None
    enqueued_at: float = field(default_factory=time.perf_counter)


class BatchingSampler:
    """Coalesces sample requests into fixed-shape device batches.

    ``submit(n)`` blocks until the worker thread has produced ``n`` images.
    Requests with the same (seed-group, label) coalesce; an explicitly
    seeded request runs in its own batch so its output is a pure function of
    (archive, seed, n) — the determinism story a reproducible-serving setup
    needs — while unseeded traffic shares batches and draws from the
    server's request counter.
    """

    def __init__(
        self,
        model,
        image_size: int,
        max_batch: int = 64,
        linger_ms: float = 5.0,
        use_ema: bool = True,
        base_seed: int = 0,
        transfer: str = "uint8",
        mesh=None,
        mel_frames: Optional[int] = None,
    ):
        import jax

        self.model = model
        self.image_size = int(image_size)
        self.max_batch = int(max_batch)
        # SR3 archives serve super-resolution (requests carry LR inputs);
        # their unconditional /sample has nothing to condition on.
        self.sr_mode = hasattr(model, "super_resolve")
        self.lr_size = (
            self.image_size // int(model.scale_factor) if self.sr_mode else None
        )
        # WaveGrad vocoder archives serve mel→waveform (requests carry mel);
        # like SR, generation-without-input has nothing to condition on.
        self.vocode_mode = hasattr(model, "vocode")
        # Text-conditional archives take per-request prompts. Prompts are
        # runtime DATA (token arrays through one cached jit), not graph
        # constants — so requests with DIFFERENT prompts coalesce into one
        # device batch; only the guidance scale is baked into the graph.
        self.text_mode = hasattr(model, "_tokens_array")
        self.mel_frames = (
            int(mel_frames or model.segment_frames) if self.vocode_mode else None
        )
        if self.vocode_mode and transfer == "uint8":
            # Waveforms are signed float — image quantization would clip
            # the negative half; responses are always float32 npy.
            transfer = "float32"
        # Multi-chip serving: shard each device batch over the mesh's data
        # axis (params replicated) — the same cached-jit scan, partitioned by
        # XLA SPMD. The compiled shape is global, so it must divide evenly.
        self.mesh = mesh
        if mesh is not None:
            data_size = int(mesh.shape.get("data", 1))
            if self.max_batch % max(data_size, 1):
                raise ValueError(
                    f"max_batch={self.max_batch} must be divisible by the mesh "
                    f"data axis ({data_size}) for fixed-shape sharded serving"
                )
        self.linger_s = float(linger_ms) / 1e3
        self.use_ema = bool(use_ema)
        if transfer not in ("uint8", "float32"):
            raise ValueError(f"transfer must be 'uint8' or 'float32', got {transfer!r}")
        self.transfer = transfer
        self._to_u8 = None
        if transfer == "uint8":
            import jax.numpy as jnp

            # Quantize ON DEVICE before the host copy: the responses are
            # uint8 anyway (PNG) and the device→host transfer is a tunnel
            # round-trip on remote-TPU rigs — 4× fewer bytes per batch.
            # Matches utils.image.to_uint8 bit-for-bit.
            self._to_u8 = jax.jit(
                lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
            )
        self._base_key = jax.random.PRNGKey(base_seed)
        self._batch_counter = 0
        self._queue: List[_Request] = []
        self._cv = threading.Condition()
        self._stop = False
        self._warm = False
        self.stats: Dict[str, Any] = {
            "requests": 0,
            "images": 0,
            "batches": 0,
            "batch_fill_sum": 0.0,
            "latency_ms_sum": 0.0,
            "device_ms_sum": 0.0,
        }
        self._worker = threading.Thread(target=self._run, daemon=True)

    # ---- lifecycle -----------------------------------------------------------
    def start(self, warmup: bool = True) -> "BatchingSampler":
        if warmup:
            if self.sr_mode:
                zeros = np.zeros(
                    (self.max_batch, self.lr_size, self.lr_size, int(self.model.channels)),
                    np.float32,
                )
                np.asarray(self._dispatch_sr(zeros, self._next_key()))
            elif self.vocode_mode:
                zeros = np.zeros(
                    (self.max_batch, self.mel_frames, int(self.model.n_mels)), np.float32
                )
                np.asarray(self._dispatch_vocode(zeros, self._next_key()))
            else:
                self._device_sample(self.max_batch, self._next_key(), None)
            self._warm = True
        self._worker.start()
        return self

    def stop(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=10.0)

    @property
    def warm(self) -> bool:
        return self._warm

    # ---- client surface ------------------------------------------------------
    def submit(
        self,
        num_images: int,
        seed: Optional[int] = None,
        label: Optional[int] = None,
        timeout: Optional[float] = None,
        guidance_scale: Optional[float] = None,
        text: Optional[str] = None,
        negative_text: Optional[str] = None,
    ) -> np.ndarray:
        if self.sr_mode:
            raise ValueError(
                "this archive is an SR3 super-resolution model: POST "
                "/super_resolve with input images (submit_sr), not /sample"
            )
        if self.vocode_mode:
            raise ValueError(
                "this archive is a WaveGrad vocoder: POST /vocode with "
                "log-mel inputs (submit_vocode), not /sample"
            )
        if (text is not None or negative_text is not None) and not self.text_mode:
            raise ValueError(
                f"{type(self.model).__name__} is not text-conditional; "
                "text/negative_text need a TextConditionalDDPM archive"
            )
        if guidance_scale is not None and not hasattr(self.model, "_cfg_model_fn"):
            raise ValueError("guidance_scale requires a class-conditional model")
        if self.text_mode and guidance_scale is not None and not text:
            raise ValueError("guidance_scale requires a text prompt on this archive")
        if negative_text is not None and guidance_scale is None:
            raise ValueError("negative_text requires guidance_scale")
        if num_images < 1:
            raise ValueError("num_images must be >= 1")
        if num_images > self.max_batch:
            # Large requests are served in max_batch chunks — fixed shapes.
            parts = []
            remaining = num_images
            chunk_idx = 0
            while remaining > 0:
                n = min(remaining, self.max_batch)
                chunk_seed = None if seed is None else seed + chunk_idx
                parts.append(
                    self.submit(
                        n, chunk_seed, label, timeout, guidance_scale,
                        text, negative_text,
                    )
                )
                remaining -= n
                chunk_idx += 1
            return np.concatenate(parts, axis=0)
        req = _Request(
            num_images=num_images, seed=seed, label=label,
            guidance_scale=guidance_scale, text=text, neg_text=negative_text,
        )
        with self._cv:
            self._queue.append(req)
            self._cv.notify_all()
        if not req.done.wait(timeout=timeout):
            raise TimeoutError(f"sample request not served within {timeout}s")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def submit_sr(
        self,
        images: np.ndarray,
        seed: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        """Super-resolve LR inputs [n, h, w, C] (float in [0,1] or uint8).

        Blocks until the worker produces the [n, h*s, w*s, C] outputs. Like
        ``submit``: oversized requests are chunked at the compiled shape,
        seeded requests run in their own (zero-padded) batch so the output
        is a pure function of (archive, seed, images)."""
        if not self.sr_mode:
            raise ValueError("submit_sr requires an SR3 archive (use submit)")
        images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"images must be [n, h, w, C], got {images.shape}")
        images = _to_unit_float_images(images, "LR inputs")
        expect = (self.lr_size, self.lr_size, int(self.model.channels))
        if tuple(images.shape[1:]) != expect:
            raise ValueError(
                f"LR inputs must be [n, {expect[0]}, {expect[1]}, {expect[2]}] "
                f"for this archive (scale {self.model.scale_factor}); got {images.shape}"
            )
        n = images.shape[0]
        if n < 1:
            raise ValueError("need at least one input image")
        if n > self.max_batch:
            parts = []
            for i, off in enumerate(range(0, n, self.max_batch)):
                chunk_seed = None if seed is None else seed + i
                parts.append(
                    self.submit_sr(images[off : off + self.max_batch], chunk_seed, timeout)
                )
            return np.concatenate(parts, axis=0)
        req = _Request(num_images=n, seed=seed, label=None, images=images)
        with self._cv:
            self._queue.append(req)
            self._cv.notify_all()
        if not req.done.wait(timeout=timeout):
            raise TimeoutError(f"super_resolve request not served within {timeout}s")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def submit_edit(
        self,
        images: np.ndarray,
        strength: float = 0.5,
        seed: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        """SDEdit the inputs [n, H, W, C] (float in [0,1] or uint8) at the
        model's image size.

        Same contract as ``submit``/``submit_sr``: oversized requests chunk
        at the compiled shape, seeded requests run alone so the output is a
        pure function of (archive, seed, images, strength), unseeded traffic
        coalesces per strength (each distinct strength is its own cached
        jit graph — the partial-chain length is baked into the scan)."""
        if self.sr_mode or self.vocode_mode:
            raise ValueError("/edit requires a generation archive (DDPM family)")
        if not hasattr(self.model, "edit"):
            raise ValueError(
                f"{type(self.model).__name__} has no edit surface (SDEdit "
                "needs a DDPM-family ancestral sampler)"
            )
        if not 0.0 <= float(strength) <= 1.0:
            raise ValueError(f"strength must be in [0, 1], got {strength}")
        images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"images must be [n, H, W, C], got {images.shape}")
        images = _to_unit_float_images(images, "edit inputs")
        expect = (self.image_size, self.image_size, int(self.model.channels))
        if tuple(images.shape[1:]) != expect:
            raise ValueError(
                f"edit inputs must be [n, {expect[0]}, {expect[1]}, {expect[2]}] "
                f"for this archive; got {images.shape}"
            )
        n = images.shape[0]
        if n < 1:
            raise ValueError("need at least one input image")
        if n > self.max_batch:
            parts = []
            for i, off in enumerate(range(0, n, self.max_batch)):
                chunk_seed = None if seed is None else seed + i
                parts.append(
                    self.submit_edit(
                        images[off : off + self.max_batch], strength, chunk_seed, timeout
                    )
                )
            return np.concatenate(parts, axis=0)
        req = _Request(
            num_images=n, seed=seed, label=None, images=images,
            strength=float(strength),
        )
        with self._cv:
            self._queue.append(req)
            self._cv.notify_all()
        if not req.done.wait(timeout=timeout):
            raise TimeoutError(f"edit request not served within {timeout}s")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def submit_vocode(
        self,
        mel: np.ndarray,
        seed: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        """Vocode log-mel inputs [n, F, n_mels] → waveforms [n, F·hop].

        Same contract as ``submit``/``submit_sr``: oversized requests chunk
        at the compiled shape, seeded requests run alone so the output is a
        pure function of (archive, seed, mel), unseeded traffic coalesces."""
        if not self.vocode_mode:
            raise ValueError("submit_vocode requires a WaveGrad vocoder archive")
        mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim != 3:
            raise ValueError(f"mel must be [n, F, n_mels], got {mel.shape}")
        expect = (self.mel_frames, int(self.model.n_mels))
        if tuple(mel.shape[1:]) != expect:
            raise ValueError(
                f"mel inputs must be [n, {expect[0]}, {expect[1]}] for this "
                f"server (compiled mel_frames={self.mel_frames}); got {mel.shape}"
            )
        n = mel.shape[0]
        if n < 1:
            raise ValueError("need at least one mel input")
        if n > self.max_batch:
            parts = []
            for i, off in enumerate(range(0, n, self.max_batch)):
                chunk_seed = None if seed is None else seed + i
                parts.append(
                    self.submit_vocode(mel[off : off + self.max_batch], chunk_seed, timeout)
                )
            return np.concatenate(parts, axis=0)
        req = _Request(num_images=n, seed=seed, label=None, mel=mel)
        with self._cv:
            self._queue.append(req)
            self._cv.notify_all()
        if not req.done.wait(timeout=timeout):
            raise TimeoutError(f"vocode request not served within {timeout}s")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    # ---- worker --------------------------------------------------------------
    def _next_key(self):
        import jax

        self._batch_counter += 1
        return jax.random.fold_in(self._base_key, self._batch_counter)

    def _dispatch_sample(
        self,
        batch: int,
        key,
        label: Optional[int],
        guidance_scale: Optional[float] = None,
        texts: Optional[List[str]] = None,
        neg_texts: Optional[List[str]] = None,
    ):
        """Enqueue one device batch; returns the (async) device array.

        jax dispatch is asynchronous — materializing with np.asarray is
        deferred to ``_complete`` so the NEXT batch's compute overlaps this
        batch's device→host transfer (on a remote-TPU rig the transfer is a
        full tunnel round-trip; unpipelined it cost ~55% of serving
        throughput: 823 vs 1908 sps at DDIM-50/B=128).
        """
        kwargs = {}
        if label is not None:
            kwargs["label"] = int(label)
        if texts is not None:
            # Per-image prompt rows: "" encodes to the all-PAD null context,
            # so padding rows and unprompted requests ride the same batch.
            kwargs["text"] = texts
        if neg_texts is not None:
            kwargs["negative_text"] = neg_texts
        if guidance_scale is not None:
            # Each distinct w is its own cached jit graph (the scale is baked
            # into the scan); the first request at a new w pays a compile.
            kwargs["guidance_scale"] = float(guidance_scale)
        if self.mesh is not None:
            kwargs["mesh"] = self.mesh
        out = self.model.sample(
            batch_size=batch,
            image_size=self.image_size,
            key=key,
            use_ema=self.use_ema,
            **kwargs,
        )
        if self._to_u8 is not None:
            out = self._to_u8(out)
        return out

    def _device_sample(self, batch: int, key, label: Optional[int]) -> np.ndarray:
        return np.asarray(self._dispatch_sample(batch, key, label))

    def _dispatch_sr(self, images: np.ndarray, key):
        """Enqueue one fixed-shape super-resolve batch (async, like
        ``_dispatch_sample``): pad the stacked LR inputs to ``max_batch``
        rows (padding rows are computed and discarded — fixed shapes keep
        the one-compile invariant)."""
        import jax.numpy as jnp

        n = images.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad], axis=0)
        kwargs = {}
        if self.mesh is not None:
            kwargs["mesh"] = self.mesh
        out = self.model.super_resolve(
            jnp.asarray(images), key=key, use_ema=self.use_ema, **kwargs
        )
        if self._to_u8 is not None:
            out = self._to_u8(out)
        return out

    def _dispatch_edit(self, images: np.ndarray, strength: float, key):
        """Enqueue one fixed-shape SDEdit batch (async, like
        ``_dispatch_sample``): pad the stacked inputs to ``max_batch`` rows
        (padding rows are computed and discarded — fixed shapes keep the
        one-compile-per-strength invariant)."""
        import jax.numpy as jnp

        n = images.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad], axis=0)
        kwargs = {}
        if self.mesh is not None:
            kwargs["mesh"] = self.mesh
        out = self.model.edit(
            jnp.asarray(images), strength=strength, key=key,
            use_ema=self.use_ema, **kwargs
        )
        if self._to_u8 is not None:
            out = self._to_u8(out)
        return out

    def _dispatch_vocode(self, mels: np.ndarray, key):
        """Enqueue one fixed-shape vocode batch (async): pad the stacked mel
        inputs to ``max_batch`` rows; padding rows are computed-and-discarded
        (fixed shapes keep the one-compile invariant). Output stays float32 —
        no uint8 quantization for waveforms."""
        import jax.numpy as jnp

        n = mels.shape[0]
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n,) + mels.shape[1:], mels.dtype)
            mels = np.concatenate([mels, pad], axis=0)
        kwargs = {}
        if self.mesh is not None:
            kwargs["mesh"] = self.mesh
        return self.model.vocode(
            jnp.asarray(mels), key=key, use_ema=self.use_ema, **kwargs
        )

    def _take_group(self) -> List[_Request]:
        """Pop a coalescable group: same label; seeded requests go alone."""
        head = self._queue[0]
        if head.seed is not None:
            return [self._queue.pop(0)]
        group: List[_Request] = []
        total = 0
        i = 0
        while i < len(self._queue):
            r = self._queue[i]
            if (
                r.seed is None
                and r.label == head.label
                and r.guidance_scale == head.guidance_scale
                and r.strength == head.strength
                and (r.images is None) == (head.images is None)
                and total + r.num_images <= self.max_batch
            ):
                group.append(self._queue.pop(i))
                total += r.num_images
            else:
                i += 1
            if total >= self.max_batch:
                break
        return group

    def _complete(self, pending) -> None:
        """Materialize a dispatched batch and hand slices to its requests."""
        group, images_dev, t0 = pending
        try:
            images = np.asarray(images_dev)  # blocks until device + transfer done
            device_ms = (time.perf_counter() - t0) * 1e3
            total = sum(r.num_images for r in group)
            off = 0
            now = time.perf_counter()
            for r in group:
                r.result = images[off : off + r.num_images]
                off += r.num_images
                self.stats["latency_ms_sum"] += (now - r.enqueued_at) * 1e3
                r.done.set()
            self.stats["requests"] += len(group)
            self.stats["images"] += total
            self.stats["batches"] += 1
            self.stats["batch_fill_sum"] += total / self.max_batch
            self.stats["device_ms_sum"] += device_ms
        except Exception as e:
            for r in group:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()

    def _run(self) -> None:
        import jax

        # One-deep pipeline: dispatch batch k+1 before materializing batch k,
        # so the next batch's device compute overlaps this batch's
        # device→host transfer and per-request PNG/slicing work.
        pending = None
        while True:
            with self._cv:
                while not self._queue and not self._stop and pending is None:
                    self._cv.wait()
                if self._stop:
                    if pending is not None:
                        pass  # completed below, outside the lock
                    queued = self._queue
                    self._queue = []
                else:
                    queued = None
                group = None
                if not self._stop and self._queue:
                    # Linger briefly so concurrent requests can coalesce.
                    deadline = self._queue[0].enqueued_at + self.linger_s
                    while time.perf_counter() < deadline:
                        remaining = deadline - time.perf_counter()
                        if remaining > 0:
                            self._cv.wait(timeout=remaining)
                    group = self._take_group()
            if self._stop:
                if pending is not None:
                    self._complete(pending)
                for r in queued:
                    r.error = "server shutting down"
                    r.done.set()
                return
            dispatched = None
            if group is not None:
                try:
                    key = (
                        jax.random.PRNGKey(group[0].seed)
                        if group[0].seed is not None
                        else self._next_key()
                    )
                    t0 = time.perf_counter()
                    # Fixed-shape call: always max_batch; surplus dropped.
                    if self.sr_mode:
                        stacked = np.concatenate([r.images for r in group], axis=0)
                        out_dev = self._dispatch_sr(stacked, key)
                    elif self.vocode_mode:
                        stacked = np.concatenate([r.mel for r in group], axis=0)
                        out_dev = self._dispatch_vocode(stacked, key)
                    elif group[0].images is not None:  # SDEdit requests
                        stacked = np.concatenate([r.images for r in group], axis=0)
                        out_dev = self._dispatch_edit(stacked, group[0].strength, key)
                    else:
                        texts = neg_texts = None
                        if self.text_mode:
                            # Prompts are per-image data rows; pad to the
                            # compiled shape with "" (the null context).
                            texts, neg_texts = [], []
                            for r in group:
                                texts += [r.text or ""] * r.num_images
                                neg_texts += [r.neg_text or ""] * r.num_images
                            pad = self.max_batch - len(texts)
                            texts += [""] * pad
                            neg_texts += [""] * pad
                            if group[0].guidance_scale is None:
                                neg_texts = None
                        out_dev = self._dispatch_sample(
                            self.max_batch, key, group[0].label,
                            group[0].guidance_scale, texts, neg_texts,
                        )
                    dispatched = (group, out_dev, t0)
                except Exception as e:
                    for r in group:
                        r.error = f"{type(e).__name__}: {e}"
                        r.done.set()
            if pending is not None:
                self._complete(pending)
            pending = dispatched

    def snapshot_stats(self) -> Dict[str, Any]:
        s = dict(self.stats)
        b = max(s["batches"], 1)
        r = max(s["requests"], 1)
        return {
            "requests": s["requests"],
            "images": s["images"],
            "batches": s["batches"],
            "avg_batch_fill": round(s["batch_fill_sum"] / b, 4),
            "avg_request_latency_ms": round(s["latency_ms_sum"] / r, 3),
            "avg_device_ms_per_batch": round(s["device_ms_sum"] / b, 3),
            "max_batch": self.max_batch,
        }


def _png_b64(image: np.ndarray) -> str:
    from PIL import Image

    from ..utils.image import to_uint8

    arr = image if image.dtype == np.uint8 else to_uint8(image[None])[0]
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class SamplingServer:
    """HTTP front-end over :class:`BatchingSampler` (stdlib only)."""

    def __init__(self, batcher: BatchingSampler, host: str = "127.0.0.1", port: int = 8000):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.batcher = batcher
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route to our logger
                logging.info("serving: " + fmt % args)

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(
                        200,
                        {
                            "status": "ok",
                            "warm": server.batcher.warm,
                            "mode": (
                                "super_resolve"
                                if server.batcher.sr_mode
                                else "vocode" if server.batcher.vocode_mode else "sample"
                            ),
                        },
                    )
                elif self.path == "/stats":
                    self._json(200, server.batcher.snapshot_stats())
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def _decode_and_submit(self):
                """Payload decode + submit_* call; returns (images, fmt).

                ValueError/TypeError/KeyError/binascii.Error raised here are
                the CLIENT's fault (bad base64/npy, wrong shape/range,
                non-numeric strength/guidance, failed submit validation) —
                faults inside the sampling worker surface as RuntimeError
                (``req.error`` re-raise) and map to 500 in ``do_POST``.
                """
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                seed = payload.get("seed")
                fmt = payload.get("format", "png")
                timeout = float(payload.get("timeout", 600.0))
                if self.path == "/vocode":
                    blob = payload.get("mel_npy")
                    if not blob:
                        raise ValueError("mel_npy (base64 of an np.save'd [N,F,n_mels] array) is required")
                    arr = np.load(io.BytesIO(base64.b64decode(blob)), allow_pickle=False)
                    images = server.batcher.submit_vocode(arr, seed=seed, timeout=timeout)
                    fmt = "npy"  # waveforms have no PNG form
                elif self.path == "/edit":
                    blob = payload.get("images_npy")
                    if not blob:
                        raise ValueError("images_npy (base64 of an np.save'd [N,H,W,C] array) is required")
                    arr = np.load(io.BytesIO(base64.b64decode(blob)), allow_pickle=False)
                    images = server.batcher.submit_edit(
                        arr, strength=float(payload.get("strength", 0.5)),
                        seed=seed, timeout=timeout,
                    )
                elif self.path == "/super_resolve":
                    blob = payload.get("images_npy")
                    if not blob:
                        raise ValueError("images_npy (base64 of an np.save'd [N,h,w,C] array) is required")
                    arr = np.load(io.BytesIO(base64.b64decode(blob)), allow_pickle=False)
                    images = server.batcher.submit_sr(arr, seed=seed, timeout=timeout)
                else:
                    n = int(payload.get("num_images", 1))
                    label = payload.get("label")
                    guidance = payload.get("guidance_scale")
                    images = server.batcher.submit(
                        n, seed=seed, label=label, timeout=timeout,
                        guidance_scale=guidance,
                        text=payload.get("text"),
                        negative_text=payload.get("negative_text"),
                    )
                return images, fmt

            def do_POST(self):
                if self.path not in ("/sample", "/super_resolve", "/vocode", "/edit"):
                    self._json(404, {"error": f"no route {self.path}"})
                    return
                try:
                    try:
                        images, fmt = self._decode_and_submit()
                    except (ValueError, TypeError, KeyError, binascii.Error) as e:
                        # CLIENT fault — 400 is scoped to payload decode +
                        # submit validation only (ADVICE r4): a genuine
                        # server-side bug of these types in the response path
                        # below still reports 500.
                        self._json(400, {"error": f"{type(e).__name__}: {e}"})
                        return
                    except TimeoutError as e:
                        self._json(504, {"error": f"{type(e).__name__}: {e}"})
                        return
                    if fmt == "npy":
                        buf = io.BytesIO()
                        np.save(buf, images)
                        body = buf.getvalue()
                        self.send_response(200)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                    elif fmt == "png":
                        self._json(200, {"images": [_png_b64(im) for im in images]})
                    else:
                        self._json(400, {"error": f"unknown format {fmt!r}"})
                except Exception as e:
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._serving = False

    def serve_forever(self) -> None:
        logging.info(f"Sampling server listening on http://{self.host}:{self.port}")
        self._serving = True
        try:
            self._httpd.serve_forever()
        finally:
            self.batcher.stop()

    def start_background(self) -> threading.Thread:
        self._serving = True
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        # http.server's shutdown() handshakes with a running serve_forever
        # loop and deadlocks if one was never started — only signal it then.
        if self._serving:
            self._httpd.shutdown()
            self._serving = False
        self._httpd.server_close()
        self.batcher.stop()


def serve(
    model_path: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_batch: int = 64,
    linger_ms: float = 5.0,
    use_ema: bool = True,
    use_ddim_sampler: bool = False,
    ddim_timesteps: int = 50,
    ddim_eta: float = 0.0,
    use_dpm_solver: bool = False,
    dpm_steps: int = 20,
    dpm_order: int = 2,
    dpm_time_spacing: str = "strided",
    use_karras_sampler: bool = False,
    karras_steps: int = 18,
    karras_order: int = 2,
    karras_s_churn: float = 0.0,
    use_unipc: bool = False,
    unipc_steps: int = 20,
    unipc_order: int = 2,
    unipc_corrector: bool = True,
    image_size: Optional[int] = None,
    base_seed: int = 0,
    transfer: str = "uint8",
    compile_cache_dir: Optional[str] = None,
    devices: int = 1,
    mel_frames: Optional[int] = None,
) -> SamplingServer:
    """Load an archive, optionally hot-swap to DDIM, warm up, and serve.

    The DDIM swap mirrors the eval scripts' ``maybe_use_ddim_sampler``
    (reference examples/ddpm/eval_ddpm.py:48-60) — production serving almost
    always wants the 50-step sampler (measured 1911 sps vs 100 sps for the
    1000-step chain on v5e at dim-32). ``compile_cache_dir`` turns the warmup
    compile into a disk hit on daemon restart (utils/compile_cache.py).
    """
    if compile_cache_dir:
        from ..utils.compile_cache import enable_persistent_compilation_cache

        enable_persistent_compilation_cache(compile_cache_dir)
    from ..models import restore_model_from_archive

    model = restore_model_from_archive(model_path, use_ema=False)
    if hasattr(model, "vocode"):
        # WaveGrad vocoder: the archive's continuous-level schedule (possibly
        # a searched fast schedule) IS the sampler; DDIM/DPM/Karras re-grids
        # condition on discrete t and would break the level-conditioned net.
        if use_karras_sampler or use_dpm_solver or use_ddim_sampler or use_unipc:
            raise ValueError(
                "vocoder archives keep their own (searchable) WaveGrad "
                "schedule: pass use_ddim_sampler=false (and no dpm/karras/"
                "unipc flags); use the schedule search in examples/"
                "wavegrad_ddpm/vocode.py for fast sampling"
            )
    elif (use_karras_sampler or use_dpm_solver or use_ddim_sampler or use_unipc) and not hasattr(
        model.sampler, "constants"
    ):
        # flow-matching archives have no discrete noise schedule to re-grid;
        # their sampler is already an ODE integrator (num_steps on the model)
        raise ValueError(
            f"{type(model).__name__} archives use their own ODE sampler; "
            "DDIM/DPM/Karras swaps only apply to DDPM-family archives"
        )
    if use_unipc:
        # UniPC (modules/unipc.py): multistep predictor-corrector — the
        # corrector raises effective order at zero extra network evals.
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.UniPCDiffusion"
        sampler_cfg["solver_steps"] = unipc_steps
        sampler_cfg["solver_order"] = unipc_order
        sampler_cfg["use_corrector"] = unipc_corrector
        model.change_sampler(sampler_cfg)
    elif use_karras_sampler:
        # EDM sampler (modules/karras_diffusion.py): Heun + Karras rho-grid,
        # optional stochastic churn — quality-grade few-step sampling.
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.KarrasDiffusion"
        sampler_cfg["solver_steps"] = karras_steps
        sampler_cfg["solver_order"] = karras_order
        sampler_cfg["s_churn"] = karras_s_churn
        model.change_sampler(sampler_cfg)
    elif use_dpm_solver:
        # DPM-Solver++(2M): DDIM-50-class quality in ~20 evals — the highest
        # throughput sampler for production serving (modules/dpm_solver.py).
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.DPMSolverDiffusion"
        sampler_cfg["solver_steps"] = dpm_steps
        sampler_cfg["solver_order"] = dpm_order
        sampler_cfg["time_spacing"] = dpm_time_spacing
        model.change_sampler(sampler_cfg)
    elif use_ddim_sampler:
        sampler_cfg = dict(model.cfg.sampler)
        sampler_cfg["_target_"] = "diffusion_model_nemo.modules.GeneralizedGaussianDiffusion"
        sampler_cfg["eta"] = ddim_eta
        sampler_cfg["ddim_timesteps"] = ddim_timesteps
        model.change_sampler(sampler_cfg)
    size = int(image_size or model.cfg.get("image_size") or 0)
    mesh = None
    if int(devices) not in (0, 1):
        import jax

        from ..parallel.mesh import make_mesh

        all_devices = jax.devices()
        n = len(all_devices) if int(devices) == -1 else min(int(devices), len(all_devices))
        if n > 1:
            mesh = make_mesh(all_devices[:n])
    batcher = BatchingSampler(
        model,
        image_size=size,
        max_batch=max_batch,
        linger_ms=linger_ms,
        use_ema=use_ema,
        base_seed=base_seed,
        transfer=transfer,
        mesh=mesh,
        mel_frames=mel_frames,
    ).start()
    return SamplingServer(batcher, host=host, port=port)
