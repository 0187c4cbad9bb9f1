"""Host data-loader throughput benchmark (VERDICT r1 #4).

Measures items/sec of real PNG decode + collate at CIFAR shape through the
framework DataLoader, serial vs thread-pooled (num_workers), and compares
against a target training step rate. Prints one JSON line.

Usage: python bench_loader.py [n_images] [num_workers] [target_sps]
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffusion_model_nemo_tpu.data import DataLoader, FileVisionDataset


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    target_sps = float(sys.argv[3]) if len(sys.argv) > 3 else 1900.0  # dim-32 train rate

    from PIL import Image

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        # Unique CIFAR-shaped PNGs so decode cost is real (no page-cache-only reads).
        for i in range(n):
            Image.fromarray(rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)).save(
                Path(d) / f"{i:06d}.png"
            )

        def run(num_workers):
            dl = DataLoader(
                FileVisionDataset(d), batch_size=128, shuffle=True, num_workers=num_workers
            )
            list(iter(dl))  # warm the page cache so both legs read hot files
            t0 = time.perf_counter()
            count = sum(b["image"].shape[0] for b in dl)
            return count / (time.perf_counter() - t0)

        serial = run(0)
        parallel = run(workers)

    print(
        json.dumps(
            {
                "metric": "host loader throughput, 32x32x3 PNG decode+collate",
                "unit": "items/sec",
                "serial": round(serial, 1),
                f"num_workers={workers}": round(parallel, 1),
                "speedup": round(parallel / serial, 2),
                "target_train_sps": target_sps,
                "feeds_chip": parallel >= target_sps,
                "host_cpus": __import__("os").cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
