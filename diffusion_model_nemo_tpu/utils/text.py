"""Byte-level tokenizer for text conditioning.

Zero-dependency (no downloaded vocabularies — this rig has no egress):
tokens are UTF-8 bytes shifted by 1 so id 0 is PAD. The DiT's context
encoder embeds these ids; the attention mask is ``tokens != 0`` with
position 0 always attended, so an all-PAD row attends exactly to the
learned PAD embedding — the classifier-free "null context"
(models/text_conditional_ddpm.py).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

__all__ = ["ByteTokenizer"]


class ByteTokenizer:
    """UTF-8 bytes + 1; id 0 = PAD. ``vocab_size`` = 257."""

    PAD = 0
    vocab_size = 257

    def __init__(self, max_len: int = 32):
        self.max_len = int(max_len)

    def encode(self, text: str) -> np.ndarray:
        """One string → ``[max_len] int32`` (truncated / PAD-padded)."""
        ids = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)[: self.max_len]
        out = np.zeros((self.max_len,), np.int32)
        out[: ids.size] = ids.astype(np.int32) + 1
        return out

    def encode_batch(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        return np.stack([self.encode(t) for t in texts])

    def decode(self, tokens) -> str:
        ids = np.asarray(tokens).reshape(-1)
        return bytes(int(i) - 1 for i in ids if int(i) > 0).decode("utf-8", errors="replace")

    def null(self, batch_size: int = 1) -> np.ndarray:
        """All-PAD rows — the unconditional/null context for CFG."""
        return np.zeros((batch_size, self.max_len), np.int32)
