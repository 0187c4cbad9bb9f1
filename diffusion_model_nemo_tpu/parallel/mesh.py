"""Device mesh + sharding helpers for data-parallel (and future) scale-out.

The reference's only distribution strategy is PyTorch-Lightning DDP selected
by YAML (examples/configs/ddpm/unet_small.yaml:88); no collective calls exist
in its code. The TPU-native equivalent is a 1-D ``data`` mesh with
jit-compiled sharding: batches sharded over ``data``, parameters replicated,
and XLA emitting the gradient all-reduce over ICI automatically. The helpers
here are mesh-shape agnostic so tensor-parallel axes can be added later.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "put_global_batch",
    "local_device_count",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    dcn_mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh; default is all devices on a 1-D ``data`` axis.

    ``dcn_mesh_shape`` builds a multi-slice (DCN-connected) mesh: per-axis
    slice counts, same length as ``shape``. Axes parallelized over DCN must
    only carry slice-granular traffic (data-parallel gradient reduction), so
    the construction keeps each slice's devices contiguous in the inner
    (ICI) dims and stacks slices on the outer dims — the layout
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` produces. The
    canonical 2-slice layout is ``shape=(per_slice_data, tp)``,
    ``dcn_mesh_shape=(n_slices, 1)``: gradient psum decomposes into an
    ICI-local reduce-scatter + one DCN all-reduce of slice partials, while
    tensor-parallel collectives never leave a slice.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size // int(np.prod(dcn_mesh_shape)) if dcn_mesh_shape else devices.size,) + (1,) * (len(axis_names) - 1)
    if dcn_mesh_shape is None:
        return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))

    if len(dcn_mesh_shape) != len(shape):
        raise ValueError(
            f"dcn_mesh_shape {tuple(dcn_mesh_shape)} must match per-slice shape "
            f"{tuple(shape)} in rank"
        )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            tuple(shape), tuple(dcn_mesh_shape), devices=list(devices.flat)
        )
    except (ValueError, AttributeError, KeyError):
        # Devices without slice topology metadata (CPU meshes in tests,
        # single-slice rigs): emulate the hybrid layout by grouping devices
        # into equal contiguous "slices" ordered by (process_index, id) —
        # the same outer-DCN/inner-ICI axis ordering, minus the physical
        # coordinate optimization only real TPU metadata enables.
        n_slices = int(np.prod(dcn_mesh_shape))
        flat = sorted(devices.flat, key=lambda d: (d.process_index, d.id))
        if len(flat) % n_slices:
            raise ValueError(
                f"{len(flat)} devices cannot split into {n_slices} equal slices"
            )
        per = len(flat) // n_slices
        if per != int(np.prod(shape)):
            raise ValueError(
                f"per-slice shape {tuple(shape)} needs {int(np.prod(shape))} devices, "
                f"have {per} per slice"
            )
        rank = len(shape)
        granules = np.asarray(flat, dtype=object).reshape(
            tuple(dcn_mesh_shape) + tuple(shape)
        )
        # Interleave each DCN axis in front of its per-slice axis so
        # result[i] = dcn_mesh_shape[i] * shape[i] with slices varying
        # slowest along that axis (create_hybrid_device_mesh's layout).
        perm = [x for i in range(rank) for x in (i, rank + i)]
        arr = granules.transpose(perm).reshape(
            tuple(int(d) * int(s) for d, s in zip(dcn_mesh_shape, shape))
        )
    return Mesh(arr, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data", batch_dim: int = 0) -> NamedSharding:
    """Shard ``batch_dim`` over the data axis; replicate the rest.

    ``batch_dim=1`` serves grad-accumulation batches stacked as
    [accum, micro_batch, ...] — the accumulation axis stays on every device
    (it is scanned over), only the micro-batch is split."""
    spec = [None] * ndim
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a host batch with batch-dim sharding over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)), batch
    )


def put_global_batch(mesh: Mesh, batch: Any, batch_dim: int = 0) -> Any:
    """Assemble the *global* sharded batch from this process's local slice.

    The multi-host-correct host→device path: under ``jax.distributed`` every
    process feeds only the rows its addressable devices own, and
    ``jax.make_array_from_process_local_data`` stitches them into one global
    jax.Array (no cross-host data movement — each shard stays where it was
    produced). With a single process this degenerates to a plain sharded
    ``device_put`` of the full batch, so the same Trainer code is correct on
    one chip, one slice, or many hosts.
    """

    def put(x):
        x = np.asarray(x)
        sharding = data_sharding(mesh, x.ndim, batch_dim=batch_dim)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)


def local_device_count() -> int:
    return jax.local_device_count()


def sample_shardings(mesh, shape, shard_axis: str = "batch", frames: bool = False):
    """(replicated, images, frames) NamedShardings for mesh-sharded sampling.

    One place for the split semantics every model family shares:
    ``shard_axis="batch"`` splits dim 0 (throughput for many outputs),
    ``"spatial"`` splits dim 1 — image rows, or the time axis for waveforms —
    with XLA SPMD inserting the conv halo exchanges. Frames stack the scan
    axis in front, so the same spec shifts right by one.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims = {"batch": 0, "spatial": 1}
    if shard_axis not in dims:
        raise ValueError(f"shard_axis must be one of {sorted(dims)}, got {shard_axis!r}")
    spec = [None] * len(shape)
    spec[dims[shard_axis]] = "data"
    rep = NamedSharding(mesh, P())
    out = NamedSharding(mesh, P(*spec))
    frames_out = NamedSharding(mesh, P(None, *spec)) if frames else None
    return rep, out, frames_out


def mesh_cache_key(mesh) -> tuple:
    """Hashable identity for jit caches: axis layout AND device identity —
    two same-shaped meshes over different chips must not share a compiled
    function whose baked shardings reference the first mesh's devices."""
    if mesh is None:
        return None
    return (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
