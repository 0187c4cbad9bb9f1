"""Pipeline parallelism (parallel/pipeline.py): the GPipe shard_map+ppermute
schedule must be EXACTLY the sequential stage composition — forward and
backward — for array and pytree activations, alone and composed with data
parallelism, including a real DiT transformer stage stack and a full
pipelined optimizer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.parallel import (
    make_mesh,
    pipeline_apply,
    pipeline_spec,
    stack_pipeline_params,
)

P_STAGES = 4
D = 16


@pytest.fixture
def mlp_stages(rng):
    stages = []
    key = rng
    for _ in range(P_STAGES):
        k1, k2, key = jax.random.split(key, 3)
        stages.append(
            {
                "w": jax.random.normal(k1, (D, D)) * 0.3,
                "b": jax.random.normal(k2, (D,)) * 0.1,
            }
        )
    return stages


def _mlp_stage(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _sequential(stage_fn, stages, x):
    for s in stages:
        x = stage_fn(s, x)
    return x


def test_pipeline_forward_exact(mlp_stages, rng):
    """Pipelined forward == sequential composition bitwise (same dot order:
    each microbatch sees the identical per-stage computation)."""
    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))
    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, D))
    seq = _sequential(_mlp_stage, mlp_stages, x)
    out = pipeline_apply(_mlp_stage, stack_pipeline_params(mlp_stages), x, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


@pytest.mark.slow  # 43 s warm: extra pipelined schedule compile
def test_pipeline_more_microbatches_than_stages(mlp_stages, rng):
    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))
    x = jax.random.normal(rng, (16, D))
    seq = _sequential(_mlp_stage, mlp_stages, x)
    out = pipeline_apply(
        _mlp_stage, stack_pipeline_params(mlp_stages), x, mesh, num_microbatches=8
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


@pytest.mark.slow  # 70 s: pipelined grads vs sequential, fwd+bwd compile x2
def test_pipeline_gradients_match_sequential(mlp_stages, rng):
    """jax.grad through the pipeline (ppermute transpose = reverse permute)
    equals sequential backprop."""
    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))
    x = jax.random.normal(rng, (8, D))
    stacked = stack_pipeline_params(mlp_stages)

    g_pipe = jax.grad(lambda sp: jnp.sum(pipeline_apply(_mlp_stage, sp, x, mesh) ** 2))(
        stacked
    )
    g_seq = jax.grad(
        lambda sp: jnp.sum(
            _sequential(
                _mlp_stage,
                [jax.tree.map(lambda l: l[i], sp) for i in range(P_STAGES)],
                x,
            )
            ** 2
        )
    )(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # 27 s warm: DPxPP mesh schedule compile
def test_pipeline_dp_pp_composition(mlp_stages, rng):
    """2-D (data, pipe) mesh: batch sharded over data while activations
    rotate over pipe; numerics unchanged."""
    mesh = make_mesh(jax.devices(), axis_names=("data", "pipe"), shape=(2, 4))
    x = jax.random.normal(rng, (8, D))
    seq = _sequential(_mlp_stage, mlp_stages, x)
    out = pipeline_apply(
        _mlp_stage, stack_pipeline_params(mlp_stages), x, mesh, data_axis="data"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # 43 s warm: pytree-activation schedule compile
def test_pipeline_pytree_activations(mlp_stages, rng):
    """Pytree activations: the conditioning leaf rides the pipe unchanged
    while the token leaf transforms (the DiT (tokens, c) pattern)."""
    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))

    def stage_fn(p, h):
        return {"tok": jnp.tanh(h["tok"] @ p["w"] + p["b"] + h["c"][:, None]), "c": h["c"]}

    c = jax.random.normal(jax.random.fold_in(rng, 2), (8,))
    h = {"tok": jax.random.normal(rng, (8, D)), "c": c}
    seq = _sequential(stage_fn, mlp_stages, h)
    out = pipeline_apply(stage_fn, stack_pipeline_params(mlp_stages), h, mesh)
    np.testing.assert_array_equal(np.asarray(out["tok"]), np.asarray(seq["tok"]))
    np.testing.assert_array_equal(np.asarray(out["c"]), np.asarray(c))


def test_pipeline_validation_errors(mlp_stages, rng):
    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))
    stacked = stack_pipeline_params(mlp_stages)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_mlp_stage, stacked, jnp.zeros((6, D)), mesh, num_microbatches=4)
    bad = jax.tree.map(lambda l: l[:2], stacked)  # 2 stages on a 4-way axis
    with pytest.raises(ValueError, match="lead dim"):
        pipeline_apply(_mlp_stage, bad, jnp.zeros((8, D)), mesh)


@pytest.mark.slow  # 125 s: pipelined vs sequential DiT stacks, two big compiles
def test_pipelined_dit_blocks_match_sequential(rng):
    """A real transformer pipeline: P DiTBlocks (adaLN-zero attention+MLP
    stages) pipelined over 4 devices equal the sequential block stack."""
    from diffusion_model_nemo_tpu.modules.dit import DiTBlock

    dim, heads, B, N = 32, 4, 8, 16
    block = DiTBlock(dim=dim, heads=heads)
    tok = jax.random.normal(rng, (B, N, dim))
    c = jax.random.normal(jax.random.fold_in(rng, 1), (B, dim))

    stage_trees = []
    for i in range(P_STAGES):
        v = block.init(jax.random.fold_in(rng, 10 + i), tok, c)
        # zero-init adaLN makes blocks identities; perturb so stages act
        stage_trees.append(jax.tree.map(lambda p: p + 0.05, v["params"]))

    def stage_fn(p, h):
        return {"tok": block.apply({"params": p}, h["tok"], h["c"]), "c": h["c"]}

    seq = _sequential(stage_fn, stage_trees, {"tok": tok, "c": c})

    mesh = make_mesh(jax.devices()[:P_STAGES], axis_names=("pipe",), shape=(P_STAGES,))
    stacked = stack_pipeline_params(stage_trees)
    # place each stage's slice on its pipe device (the production layout)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh, "pipe"))
    out = pipeline_apply(stage_fn, stacked, {"tok": tok, "c": c}, mesh)
    np.testing.assert_allclose(
        np.asarray(out["tok"]), np.asarray(seq["tok"]), rtol=1e-5, atol=1e-6
    )


def test_pipelined_train_step(mlp_stages, rng):
    """A full pipelined optimizer step: loss + grads + adam update with the
    stacked params sharded over pipe; matches the sequential update."""
    import optax

    mesh = make_mesh(jax.devices(), axis_names=("data", "pipe"), shape=(2, 4))
    x = jax.random.normal(rng, (8, D))
    target = jax.random.normal(jax.random.fold_in(rng, 3), (8, D))
    stacked = stack_pipeline_params(mlp_stages)
    sharded = jax.device_put(stacked, pipeline_spec(stacked, mesh, "pipe"))
    tx = optax.adam(1e-2)

    def make_update(pipe: bool):
        def loss_fn(sp):
            if pipe:
                y = pipeline_apply(_mlp_stage, sp, x, mesh, data_axis="data")
            else:
                y = _sequential(
                    _mlp_stage,
                    [jax.tree.map(lambda l: l[i], sp) for i in range(P_STAGES)],
                    x,
                )
            return jnp.mean((y - target) ** 2)

        @jax.jit
        def update(sp, opt):
            loss, grads = jax.value_and_grad(loss_fn)(sp)
            updates, opt = tx.update(grads, opt, sp)
            return optax.apply_updates(sp, updates), opt, loss

        return update

    p1, _, l1 = make_update(True)(sharded, tx.init(sharded))
    p2, _, l2 = make_update(False)(stacked, tx.init(stacked))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
