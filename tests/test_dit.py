"""DiT backbone: shapes, adaLN-zero identity, MoE routing math, family
integration, and the expert-parallel sharding strategy.

The DiT is beyond the reference's surface (its only network is the conv
U-Net, reference modules/unet.py:13-168) but honors the same backbone call
contract, so these tests drive it through the unmodified DDPM family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM, ConditionalDDPM
from diffusion_model_nemo_tpu.modules import DiT
from diffusion_model_nemo_tpu.modules.dit import (
    ExpertChoiceMoE,
    sincos_position_embedding_2d,
)


def _ddpm_cfg(**net_overrides):
    net = {
        "_target_": "diffusion_model_nemo.modules.DiT",
        "dim": 64,
        "depth": 2,
        "heads": 4,
        "patch_size": 2,
        "channels": 3,
    }
    net.update(net_overrides)
    return from_dict(
        {
            "image_size": 8,
            "timesteps": 10,
            "channels": 3,
            "save_every": 0,
            "diffusion_model": net,
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": 10,
                "schedule_name": "linear",
            },
            "loss": {
                "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
                "loss_type": "l2",
            },
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )


# ---------------------------------------------------------------- network ----
def test_dit_shapes_and_zero_init(rng):
    """adaLN-Zero + zero-init head: output is exactly zero at initialization,
    with the right shape for plain / learned-variance / out_dim configs."""
    x = jax.random.normal(rng, (2, 8, 8, 3))
    t = jnp.array([1.0, 7.0])

    net = DiT(dim=64, depth=2, heads=4, patch_size=2, channels=3)
    v = net.init(rng, x, t)
    out = net.apply(v, x, t)
    assert out.shape == (2, 8, 8, 3) and out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) == 0.0

    lv = DiT(dim=64, depth=2, heads=4, patch_size=2, channels=3, learned_variance=True)
    assert lv.apply(lv.init(rng, x, t), x, t).shape == (2, 8, 8, 6)

    od = DiT(dim=64, depth=2, heads=4, patch_size=2, channels=3, out_dim=5)
    assert od.apply(od.init(rng, x, t), x, t).shape == (2, 8, 8, 5)


def test_dit_patch_divisibility_error(rng):
    net = DiT(dim=64, depth=1, heads=4, patch_size=3, channels=3)
    with pytest.raises(ValueError, match="not divisible"):
        net.init(rng, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)))


def test_dit_time_and_class_conditioning(rng):
    """After one gradient-free perturbation of params the net is non-trivial;
    different timesteps and different classes must produce different outputs
    (the conditioning actually reaches the blocks)."""
    x = jax.random.normal(rng, (1, 8, 8, 3))
    net = DiT(dim=64, depth=2, heads=4, patch_size=2, channels=3, num_classes=5)
    v = net.init(rng, x, jnp.zeros((1,)))
    # zero-init head hides conditioning; bump all params off the zero point
    v = jax.tree.map(lambda p: p + 0.02, v)

    o_t0 = net.apply(v, x, jnp.array([0.0]))
    o_t9 = net.apply(v, x, jnp.array([9.0]))
    assert not np.allclose(np.asarray(o_t0), np.asarray(o_t9))

    o_c1 = net.apply(v, x, jnp.array([4.0]), classes=jnp.array([1]))
    o_c2 = net.apply(v, x, jnp.array([4.0]), classes=jnp.array([2]))
    o_null = net.apply(v, x, jnp.array([4.0]), classes=jnp.array([5]))
    assert not np.allclose(np.asarray(o_c1), np.asarray(o_c2))
    assert not np.allclose(np.asarray(o_c1), np.asarray(o_null))


def test_sincos_position_embedding():
    """Rows/cols are distinguishable, the table is deterministic, and the
    row half equals the column half transposed (same 1-D code both axes)."""
    pos = sincos_position_embedding_2d(4, 4, 32)
    assert pos.shape == (16, 32)
    grid = pos.reshape(4, 4, 32)
    # same row -> identical first half (row code); different rows differ
    np.testing.assert_array_equal(grid[1, 0, :16], grid[1, 3, :16])
    assert not np.allclose(grid[0, 0, :16], grid[2, 0, :16])
    # same col -> identical second half
    np.testing.assert_array_equal(grid[0, 2, 16:], grid[3, 2, 16:])
    with pytest.raises(ValueError, match="dim % 4"):
        sincos_position_embedding_2d(2, 2, 30)


# ---------------------------------------------------------------- MoE ----
def test_expert_choice_moe_matches_loop_reference(rng):
    """The einsum/gather/scatter expert-choice kernel equals a hand-rolled
    per-expert Python loop on the same parameters (routing, gating, MLP and
    combine all pinned)."""
    B, N, D, E, F = 2, 16, 8, 4, 16
    cap = 1.0
    x = jax.random.normal(rng, (B, N, D))
    moe = ExpertChoiceMoE(dim=D, hidden=F, num_experts=E, capacity_factor=cap)
    v = moe.init(rng, x)
    out = moe.apply(v, x)

    p = v["params"]
    xt = np.asarray(x).reshape(B * N, D)
    logits = xt @ np.asarray(p["router"]["kernel"]) + np.asarray(p["router"]["bias"])
    scores = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    T = B * N
    C = max(1, int(cap * T / E))
    ref = np.zeros((T, D), np.float64)
    for e in range(E):
        order = np.argsort(-scores[:, e], kind="stable")[:C]
        xe = xt[order]
        h = np.asarray(jax.nn.gelu(jnp.asarray(xe @ np.asarray(p["experts_w1"][e]) + np.asarray(p["experts_b1"][e]))))
        ye = h @ np.asarray(p["experts_w2"][e]) + np.asarray(p["experts_b2"][e])
        for c, tok in enumerate(order):
            ref[tok] += scores[tok, e] * ye[c]
    np.testing.assert_allclose(np.asarray(out).reshape(T, D), ref, rtol=1e-4, atol=1e-5)


def test_expert_choice_capacity_and_passthrough(rng):
    """Every expert processes exactly C tokens; tokens no expert picked come
    out exactly zero (the residual connection owns them)."""
    B, N, D, E = 1, 8, 8, 2
    x = jax.random.normal(rng, (B, N, D))
    moe = ExpertChoiceMoE(dim=D, hidden=8, num_experts=E, capacity_factor=0.5)
    v = moe.init(rng, x)
    out = np.asarray(moe.apply(v, x)).reshape(N, D)

    # C = 0.5 * 8 / 2 = 2 tokens per expert; <= 4 of 8 rows can be nonzero.
    nonzero_rows = int(np.sum(np.any(out != 0.0, axis=-1)))
    assert nonzero_rows <= E * 2


def test_moe_gradients_reach_router_and_experts(rng):
    """Expert-choice routing is trainable without an auxiliary loss: the
    gradient flows to the router through the combine gates."""
    x = jax.random.normal(rng, (2, 8, 8))
    moe = ExpertChoiceMoE(dim=8, hidden=8, num_experts=2)
    v = moe.init(rng, x)

    g = jax.grad(lambda p: jnp.sum(moe.apply({"params": p}, x) ** 2))(v["params"])
    assert float(jnp.max(jnp.abs(g["router"]["kernel"]))) > 0.0
    assert float(jnp.max(jnp.abs(g["experts_w1"]))) > 0.0


# ----------------------------------------------------------- family glue ----
def test_ddpm_with_dit_trains_and_samples(rng):
    """DiT as drop-in DDPM backbone: loss decreases over a few SGD steps and
    the fused sampling scan produces finite images."""
    import optax

    m = DDPM(cfg=_ddpm_cfg())
    m.init_params(rng)
    tx = optax.adam(1e-3)
    opt = tx.init(m.params)
    batch = {"image": np.random.RandomState(0).randint(0, 255, (8, 8, 8, 3), np.uint8)}

    @jax.jit
    def step(params, opt, key, i):
        (loss, _), grads = jax.value_and_grad(m.training_step, has_aux=True)(
            params, batch, key, i
        )
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    params = m.params
    losses = []
    for i in range(8):
        params, opt, loss = step(params, opt, jax.random.fold_in(rng, i), jnp.asarray(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    m.params = params
    m.ema_params = jax.tree.map(jnp.copy, params)
    imgs = m.sample(batch_size=4, image_size=8, key=rng)
    assert imgs.shape == (4, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(imgs)))


def test_dit_archive_round_trip(tmp_path, rng):
    """save_to/restore_from works with a DiT backbone (the generic registry
    restores the network class from the persisted config)."""
    from diffusion_model_nemo_tpu.models import restore_model_from_archive

    m = DDPM(cfg=_ddpm_cfg())
    m.init_params(rng)
    path = str(tmp_path / "dit.dmn")
    m.save_to(path)

    r = restore_model_from_archive(path)
    assert type(r.diffusion_model).__name__ == "DiT"
    a = m.sample(batch_size=2, image_size=8, key=rng)
    b = r.sample(batch_size=2, image_size=8, key=rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # 35 s warm: conditional DiT train + CFG sample
def test_conditional_ddpm_with_dit(rng):
    """The ConditionalDDPM family (50% null-class masking, guided sampling)
    runs unchanged on the DiT backbone."""
    cfg = _ddpm_cfg(num_classes=4)
    d = dict(cfg)
    d["num_classes"] = 4
    d["sampler"] = dict(d["sampler"])
    d["sampler"]["class_conditional"] = True
    m = ConditionalDDPM(cfg=from_dict(d))
    m.init_params(rng)

    batch = {
        "image": np.random.RandomState(0).randint(0, 255, (4, 8, 8, 3), np.uint8),
        "label": np.array([0, 1, 2, 3], np.int32),
    }
    (loss, _), grads = jax.value_and_grad(m.training_step, has_aux=True)(
        m.params, batch, rng, 0
    )
    assert np.isfinite(float(loss))

    imgs = m.sample(batch_size=2, image_size=8, key=rng, label=1, guidance_scale=2.0)
    assert imgs.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(imgs)))


# ----------------------------------------------------------- parallelism ----
def test_dit_mesh_sampling_matches_unsharded(rng):
    """sample(mesh=) over the 8-device data mesh equals the single-device
    scan bitwise (same key stream, XLA partitions the batch)."""
    from diffusion_model_nemo_tpu.parallel import make_mesh

    m = DDPM(cfg=_ddpm_cfg())
    m.init_params(rng)
    plain = m.sample(batch_size=8, image_size=8, key=rng)
    mesh = make_mesh(jax.devices())
    sharded = m.sample(batch_size=8, image_size=8, key=rng, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))


def test_tensor_parallel_shards_dit_dense_kernels(rng):
    """Shape-driven TP inference splits the DiT's Dense kernels over the
    model axis with no DiT-specific annotations."""
    from diffusion_model_nemo_tpu.parallel import (
        make_strategy_mesh,
        param_shardings_for_strategy,
    )

    m = DDPM(cfg=_ddpm_cfg())
    m.init_params(rng)
    mesh = make_strategy_mesh(jax.devices(), "tensor_parallel", 4)
    shards = param_shardings_for_strategy(m.params, mesh, "tensor_parallel")
    split = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, s in jax.tree_util.tree_leaves_with_path(
            shards, is_leaf=lambda x: hasattr(x, "spec")
        )
        if any(d is not None for d in s.spec)
    ]
    assert any("qkv" in p for p in split), split
    assert any("mlp_in" in p for p in split), split


def test_expert_parallel_full_train_step(rng):
    """The expert_parallel strategy: expert-stacked leaves sharded over the
    ``expert`` mesh axis, everything else replicated; a full donated
    AdamW+EMA train step executes and matches the unsharded step's loss."""
    import optax
    from functools import partial

    from diffusion_model_nemo_tpu.parallel import (
        data_sharding,
        make_strategy_mesh,
        param_shardings_for_strategy,
    )
    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    m = DDPM(cfg=_ddpm_cfg(moe_experts=4, moe_every=1))
    m.init_params(rng)
    mesh = make_strategy_mesh(jax.devices(), "expert_parallel", 4)
    assert dict(mesh.shape) == {"data": 2, "expert": 4}
    shards = param_shardings_for_strategy(m.params, mesh, "expert_parallel")

    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_leaves_with_path(
            shards, is_leaf=lambda x: hasattr(x, "spec")
        )
    }
    expert_leaves = {k: s for k, s in flat.items() if "experts_" in k}
    assert len(expert_leaves) == 8  # 2 blocks x (w1, b1, w2, b2)
    assert all(s.spec and s.spec[0] == "expert" for s in expert_leaves.values())
    assert all(
        not any(d is not None for d in s.spec)
        for k, s in flat.items()
        if "experts_" not in k
    )

    tx, _ = build_optimizer(m.cfg.get("optim"), max_steps=10, grad_clip=1.0)
    batch_np = {"image": np.random.RandomState(1).randint(0, 255, (4, 8, 8, 3), np.uint8)}

    def run(params_sharding, batch_put):
        if params_sharding is None:
            params = jax.tree.map(jnp.copy, m.params)
            ema = jax.tree.map(jnp.copy, m.params)
        else:
            params = jax.device_put(jax.tree.map(jnp.copy, m.params), params_sharding)
            ema = jax.device_put(jax.tree.map(jnp.copy, m.params), params_sharding)
        opt = (
            jax.jit(
                tx.init,
                out_shardings=param_shardings_for_strategy(
                    jax.eval_shape(tx.init, params), mesh, "expert_parallel"
                ),
            )(params)
            if params_sharding is not None
            else tx.init(params)
        )
        batch = batch_put(batch_np)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def update(params, opt, ema, batch, key, step):
            (loss, _), grads = jax.value_and_grad(m.training_step, has_aux=True)(
                params, batch, key, step
            )
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            ema = ema_update(ema, params, 0.999, step)
            return params, opt, ema, loss

        *_, loss = update(params, opt, ema, batch, jax.random.PRNGKey(7), jnp.asarray(0))
        return float(loss)

    sharded_loss = run(
        shards,
        lambda b: {k: jax.device_put(v, data_sharding(mesh, np.ndim(v))) for k, v in b.items()},
    )
    plain_loss = run(None, lambda b: jax.tree.map(jnp.asarray, b))
    np.testing.assert_allclose(sharded_loss, plain_loss, rtol=1e-5)
