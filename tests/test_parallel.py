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


def test_trainer_steps_per_execution_on_mesh(tmp_path):
    """steps_per_execution composes with mesh data-parallelism: the scanned
    multi-step update runs with batches stacked [K, B, ...] and sharded over
    the data axis on dim 1 (trainer._put_batch stacked=True), with donated
    sharded carries. max_steps=5, K=2 also exercises the tail replay."""
    from tests.test_training_e2e import tiny_ddpm_cfg
    from diffusion_model_nemo_tpu.training import Trainer

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    init0 = np.asarray(jax.tree.leaves(model.params)[0]).copy()
    trainer = Trainer(devices=-1, max_steps=5, log_every_n_steps=2,
                      steps_per_execution=2)
    assert trainer.mesh.devices.size == 8
    trainer.fit(model)
    assert trainer.global_step == 5
    leaf0 = np.asarray(jax.tree.leaves(model.params)[0])
    assert np.all(np.isfinite(leaf0)) and np.abs(leaf0 - init0).max() > 0


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


# ---------------------------------------------------------------- strategies ----
# ddp | fsdp | tensor_parallel | fsdp_tp parameter layouts (parallel/sharding.py).
# The reference's only strategy is PTL DDP by YAML (unet_small.yaml:88); the
# extra layouts are the TPU-native scale-out story and must be bit-compatible
# with it — XLA SPMD relays out the tensors, the math is unchanged.

from diffusion_model_nemo_tpu.parallel import (
    infer_param_shardings,
    make_strategy_mesh,
    param_shardings_for_strategy,
)


def _wide_model(tmp_path):
    """dim-32 variant so feature dims are big enough to actually shard."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    cfg["diffusion_model"]["dim"] = 32
    cfg["diffusion_model"]["resnet_block_groups"] = 8
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_strategy_mesh_shapes():
    m1 = make_strategy_mesh(strategy="fsdp")
    assert m1.axis_names == ("data",) and m1.devices.size == 8
    m2 = make_strategy_mesh(strategy="tensor_parallel", tp_size=4)
    assert m2.axis_names == ("data", "model") and m2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_strategy_mesh(strategy="tensor_parallel", tp_size=3)
    # tp_size<=0 = auto (largest of 4/2/1 dividing n — never raises, even
    # for odd device counts); an explicit 1 is honored as a degenerate axis.
    m3 = make_strategy_mesh(jax.devices()[:5], strategy="tensor_parallel")
    assert m3.devices.shape == (5, 1)
    m4 = make_strategy_mesh(strategy="tensor_parallel", tp_size=1)
    assert m4.devices.shape == (8, 1)


def test_unknown_strategy_falls_back_to_ddp():
    """PTL strings like ddp_spawn keep the config-parity contract: warn at
    construction and run mesh data-parallel (no mid-fit crash)."""
    from diffusion_model_nemo_tpu.training import Trainer

    for s in ("ddp_spawn", "ddp_find_unused_parameters_false", "deepspeed"):
        t = Trainer(devices=-1, max_steps=1, strategy=s)
        assert t.strategy == "ddp" and t.mesh.axis_names == ("data",)


def test_infer_param_shardings_splits_wide_leaves(tmp_path):
    model = _wide_model(tmp_path)
    mesh = make_strategy_mesh(strategy="tensor_parallel", tp_size=4)
    shardings = infer_param_shardings(model.params, mesh, axis="model")
    flat_p = jax.tree.leaves(model.params)
    flat_s = jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding)
    )
    n_split = sum(1 for s in flat_s if "model" in str(s.spec))
    assert n_split > 0, "no parameter was tensor-sharded"
    for p, s in zip(flat_p, flat_s):
        dims = [d for d in s.spec if d is not None]
        if dims:  # every sharded dim divides evenly with >= 8 elems/shard
            i = list(s.spec).index(dims[0])
            assert p.shape[i] % 4 == 0 and p.shape[i] // 4 >= 8


@pytest.mark.slow
@pytest.mark.parametrize("strategy,tp_size", [("fsdp", 1), ("tensor_parallel", 4), ("fsdp_tp", 4)])
def test_strategy_grads_match_single_device(tmp_path, strategy, tp_size):
    """Sharded-parameter training grads == single-device grads: FSDP and TP
    are layout changes only; XLA inserts the all-gathers/reduce-scatters."""
    model = _wide_model(tmp_path)
    batch = {
        "image": np.random.RandomState(0).randint(0, 255, (16, 8, 8, 1)).astype(np.uint8),
        "label": np.zeros((16,), np.int32),
    }
    key = jax.random.PRNGKey(7)
    step = jnp.asarray(0)
    grad_fn = jax.jit(jax.grad(lambda p, b, k, s: model.training_step(p, b, k, s)[0]))

    b1 = jax.tree.map(lambda x: jax.device_put(x, jax.devices()[0]), batch)
    g1 = grad_fn(model.params, b1, key, step)

    mesh = make_strategy_mesh(strategy=strategy, tp_size=tp_size)
    p_shard = param_shardings_for_strategy(model.params, mesh, strategy)
    ps = jax.device_put(model.params, p_shard)
    bs = shard_batch(mesh, batch)
    g2 = grad_fn(ps, bs, key, step)

    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("strategy,tp_size", [("fsdp", 1), ("tensor_parallel", 4)])
def test_trainer_strategy_end_to_end(tmp_path, strategy, tp_size):
    """Trainer(strategy=...) runs a short fit with the sharded layout and
    leaves finite, correctly-laid-out params on the model."""
    from tests.test_training_e2e import tiny_ddpm_cfg
    from diffusion_model_nemo_tpu.training import Trainer

    cfg = tiny_ddpm_cfg(tmp_path)
    cfg["diffusion_model"]["dim"] = 32
    cfg["diffusion_model"]["resnet_block_groups"] = 8
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(
        devices=-1, max_steps=2, log_every_n_steps=1, strategy=strategy, tp_size=tp_size
    )
    assert trainer.mesh.devices.size == 8
    trainer.fit(model)
    for leaf in jax.tree.leaves(model.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_spatial_sharded_sampling_matches_replicated(tmp_path):
    """sample(mesh=..., shard_axis='spatial') splits image rows over the
    mesh — XLA SPMD inserts the conv halo exchanges — and must reproduce
    the unsharded images exactly (same keys, same params). This is the
    few-large-images regime (batch too small to split, activations too big
    for one chip)."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path, image_size=16)
    cfg["diffusion_model"]["input_dim"] = 16
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    plain = model.sample(batch_size=2, image_size=16, key=key)
    model._jit_cache.clear()
    sharded = model.sample(
        batch_size=2, image_size=16, key=key, mesh=mesh, shard_axis="spatial"
    )

    assert sharded.sharding.num_devices == 8
    # rows of H are split over `data`
    assert sharded.sharding.spec[1] == "data"
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_sde_sharded_sampling_matches_replicated(tmp_path):
    """ScoreSDE.sample(mesh=...) shards the PC-sampler scan over the data
    axis and must reproduce the unsharded images (same keys, same params)."""
    from diffusion_model_nemo_tpu.models import ScoreSDE
    from tests.test_models_e2e import base_cfg, IMG

    cfg = base_cfg(
        tmp_path,
        continuous=True,
        likelihood_weighting=False,
        sde={
            "sde_type": "vpsde",
            "vpsde": {
                "_target_": "diffusion_model_nemo.modules.VPSDE",
                "beta_min": 0.1,
                "beta_max": 20.0,
                "N": 10,
            },
        },
        sampler={
            "_target_": "diffusion_model_nemo.modules.PredictorCorrectorSampler",
            "predictor": "euler_maruyama",
            "corrector": None,
            "snr": 0.16,
        },
        loss={
            "_target_": "diffusion_model_nemo.loss.SDEScoreFunctionLoss",
            "continuous": True,
            "likelihood_weighting": False,
        },
    )
    model = ScoreSDE(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    plain = model.sample(batch_size=16, image_size=IMG, key=key)
    model._jit_cache.clear()
    sharded = model.sample(batch_size=16, image_size=IMG, key=key, mesh=mesh)

    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


def test_conditional_sharded_sampling_matches_replicated(tmp_path):
    """ConditionalDDPM.sample(mesh=..., label=...) shards images + labels
    over the data axis and must reproduce the unsharded samples."""
    from diffusion_model_nemo_tpu.models import ConditionalDDPM
    from tests.test_models_e2e import base_cfg, IMG

    cfg = base_cfg(
        tmp_path,
        num_classes=4,
        sampler={
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 5,
            "schedule_name": "linear",
            "class_conditional": True,
        },
    )
    cfg["diffusion_model"]["num_classes"] = 4
    model = ConditionalDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    plain = model.sample(batch_size=16, image_size=IMG, key=key, label=2)
    model._jit_cache.clear()
    sharded = model.sample(batch_size=16, image_size=IMG, key=key, label=2, mesh=mesh)

    assert sharded.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)


@pytest.mark.slow  # 33 s warm: two in-graph RK45 sampling programs
def test_sde_probflow_sharded_sampling_matches_replicated(tmp_path):
    """ScoreSDE probability-flow (in-graph RK45) sampling under mesh
    out_shardings: the adaptive while_loop partitions over the data axis and
    reproduces the unsharded images; the NFE scalar stays replicated."""
    from diffusion_model_nemo_tpu.models import ScoreSDE
    from tests.test_models_e2e import base_cfg, IMG

    cfg = base_cfg(
        tmp_path,
        continuous=True,
        likelihood_weighting=False,
        sde={
            "sde_type": "vpsde",
            "vpsde": {
                "_target_": "diffusion_model_nemo.modules.VPSDE",
                "beta_min": 0.1,
                "beta_max": 20.0,
                "N": 10,
            },
        },
        sampler={
            "_target_": "diffusion_model_nemo.modules.ProbabilityFlowSampler",
            "max_steps": 500,
        },
        loss={
            "_target_": "diffusion_model_nemo.loss.SDEScoreFunctionLoss",
            "continuous": True,
            "likelihood_weighting": False,
        },
    )
    model = ScoreSDE(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    plain, nfe = model.sample(batch_size=16, image_size=IMG, key=key, return_nfe=True)
    model._jit_cache.clear()
    sharded, nfe2 = model.sample(
        batch_size=16, image_size=IMG, key=key, return_nfe=True, mesh=mesh
    )

    assert sharded.sharding.num_devices == 8
    assert int(nfe2) == int(nfe)
    # adaptive step control amplifies sharded-reduction float noise in the
    # error norm; outputs agree to ~6e-5 relative (untrained net, |x|~1e2)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), rtol=2e-4, atol=1e-5
    )


def test_sample_shard_axis_validation(tmp_path):
    """Invalid shard_axis raises a clear error; spatial without mesh raises
    instead of silently sampling unsharded."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shard_axis"):
        model.sample(batch_size=8, image_size=8, shard_axis="spatial")
    with pytest.raises(ValueError, match="shard_axis"):
        model.sample(batch_size=8, image_size=8, mesh=make_mesh(), shard_axis="height")


# ------------------------------------------------------------- DCN multi-slice
def test_dcn_mesh_layout_slices_outer():
    """2-slice hybrid mesh (VERDICT r2 item 2): slices vary slowest on the
    data axis — each slice's 4 devices stay contiguous (ICI-inner), so the
    gradient all-reduce decomposes into slice-local reduction + one DCN hop."""
    mesh = make_mesh(axis_names=("data",), shape=(4,), dcn_mesh_shape=(2,))
    assert dict(mesh.shape) == {"data": 8}
    ids = [d.id for d in mesh.devices.flat]
    assert sorted(ids[:4]) == ids[:4] and sorted(ids[4:]) == ids[4:]
    assert set(ids) == {d.id for d in jax.devices()}


def test_dcn_mesh_2d_data_outer_tp_inner():
    """(data, model) per-slice shape (2, 2) × 2 slices on data: model axis
    (tensor-parallel collectives) never crosses a slice boundary."""
    mesh = make_mesh(
        axis_names=("data", "model"), shape=(2, 2), dcn_mesh_shape=(2, 1)
    )
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    dev = mesh.devices
    # rows 0-1 = slice 0, rows 2-3 = slice 1 (slice = 4 contiguous ids here)
    slice_of = {d.id: d.id // 4 for d in jax.devices()}
    for r in range(4):
        row_slices = {slice_of[d.id] for d in dev[r]}
        assert len(row_slices) == 1, f"model axis spans slices in row {r}"
    assert {slice_of[d.id] for d in dev[0]} == {slice_of[d.id] for d in dev[1]}
    assert {slice_of[d.id] for d in dev[0]} != {slice_of[d.id] for d in dev[2]}


@pytest.mark.slow
def test_dcn_mesh_runs_dp_step(tmp_path):
    """A jitted DP train step over the hybrid mesh matches single-device."""
    from tests.test_training_e2e import tiny_ddpm_cfg

    cfg = tiny_ddpm_cfg(tmp_path)
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    batch = {
        "image": np.random.RandomState(0).randint(0, 255, (8, 8, 8, 1), np.uint8),
        "label": np.zeros((8,), np.int32),
    }
    key = jax.random.PRNGKey(7)

    def loss_fn(params, batch):
        return model.training_step(params, batch, key, 0)[0]

    g_single = jax.grad(loss_fn)(model.params, jax.device_put(batch))

    mesh = make_mesh(axis_names=("data",), shape=(4,), dcn_mesh_shape=(2,))
    sharded = shard_batch(mesh, batch)
    rep = replicated_sharding(mesh)
    params = jax.device_put(model.params, rep)
    g_mesh = jax.jit(jax.grad(loss_fn), out_shardings=rep)(params, sharded)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dcn_mesh_shape_validation():
    with pytest.raises(ValueError):
        make_mesh(axis_names=("data",), shape=(3,), dcn_mesh_shape=(2,))
    with pytest.raises(ValueError):
        make_mesh(axis_names=("data", "model"), shape=(2, 2), dcn_mesh_shape=(2,))
