"""Data-parallel mesh tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM
from diffusion_model_nemo_tpu.parallel import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count() == 8


def test_shard_batch_places_batch_axis():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 8, 8, 1), np.uint8), "label": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, batch)
    shard_shapes = [s.data.shape for s in sharded["image"].addressable_shards]
    assert all(s == (2, 8, 8, 1) for s in shard_shapes)


def test_dp_gradients_match_single_device(tmp_path):
    """Jitted DP update over 8 devices must produce the same grads as one
    device — XLA's psum all-reduce == single-device batch."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))

    batch = {
        "image": np.random.RandomState(0).randint(0, 255, (16, 8, 8, 1)).astype(np.uint8),
        "label": np.zeros((16,), np.int32),
    }
    key = jax.random.PRNGKey(7)
    step = jnp.asarray(0)

    grad_fn = jax.jit(jax.grad(lambda p, b, k, s: model.training_step(p, b, k, s)[0]))

    # single device
    b1 = jax.tree.map(lambda x: jax.device_put(x, jax.devices()[0]), batch)
    g1 = grad_fn(model.params, b1, key, step)

    # 8-way data parallel
    mesh = make_mesh()
    b8 = shard_batch(mesh, batch)
    p8 = jax.device_put(model.params, replicated_sharding(mesh))
    g8 = grad_fn(p8, b8, key, step)

    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_trainer_runs_on_mesh(tmp_path):
    from tests.test_training_e2e import tiny_ddpm_cfg
    from diffusion_model_nemo_tpu.training import Trainer

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(devices=-1, max_steps=2, log_every_n_steps=1)
    assert trainer.mesh.devices.size == 8
    trainer.fit(model)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(model.params)[0])))


def test_sharded_sampling_matches_replicated(tmp_path):
    """sample(mesh=...) shards the batch over the data axis and must produce
    the same images as the unsharded path (same keys, same params)."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    plain = model.sample(batch_size=16, image_size=8, key=key)
    model._jit_cache.clear()
    sharded = model.sample(batch_size=16, image_size=8, key=key, mesh=mesh)

    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
