"""Background-thread batch prefetcher.

Overlaps host batch assembly (dataset reads, collate, resize) with device
compute: while the TPU runs step N, the prefetch thread builds batch N+1
(+2, ...). numpy copy/PIL work release the GIL, so a thread suffices —
no worker processes, no IPC (the reference leans on torch DataLoader's
multiprocessing for the same purpose).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

__all__ = ["ThreadedPrefetcher"]

_END = object()


class ThreadedPrefetcher:
    """Wrap any batch iterable; ``iter()`` yields batches produced ahead of
    time by a daemon thread (bounded queue of ``depth``)."""

    def __init__(self, loader: Iterable, depth: int = 2):
        self.loader = loader
        self.depth = int(depth)

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True, name="batch-prefetch")
        t.start()
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
