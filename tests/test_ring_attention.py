"""Ring attention / sequence parallelism (parallel/ring_attention.py).

Correctness anchors:
  1. The online-softmax ring accumulation over ppermute-rotated K/V blocks
     must equal full softmax attention (ops/attention.attention_reference)
     on the 8-device virtual mesh — forward AND reverse-mode (the ppermute
     transpose makes the backward pass itself a ring).
  2. Composition with batch sharding on a 2-D (data, seq) mesh.
  3. The full DiT under shard_map (seq_axis_name set) must reproduce the
     unsharded DiT bit-for-tolerance — forward and parameter gradients —
     including the per-device positional-table offset and conditional
     (class-embedding) variants. The parameter tree is identical by
     construction, so the same params drive both.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_nemo_tpu.modules import DiT
from diffusion_model_nemo_tpu.ops.attention import attention_reference
from diffusion_model_nemo_tpu.parallel import (
    make_mesh,
    sequence_parallel_dit_apply,
    sequence_sharded_attention,
)


def _qkv(B=2, N=64, H=4, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32) * D**-0.5
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("N", [64, 40])  # 8 and 5 tokens per device
def test_ring_matches_reference_forward(N):
    q, k, v = _qkv(N=N)
    mesh = make_mesh(axis_names=("seq",))
    out = sequence_sharded_attention(q, k, v, mesh=mesh, axis_name="seq")
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_ring_gradients_match_reference():
    q, k, v = _qkv()
    mesh = make_mesh(axis_names=("seq",))

    def loss_ring(q, k, v):
        return (sequence_sharded_attention(q, k, v, mesh=mesh, axis_name="seq") ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v) ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=f"grad {name}"
        )


def test_ring_composes_with_batch_sharding():
    q, k, v = _qkv()
    mesh = make_mesh(axis_names=("data", "seq"), shape=(2, 4))
    out = sequence_sharded_attention(
        q, k, v, mesh=mesh, axis_name="seq", batch_axis_name="data"
    )
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fallback_without_mesh_is_fused_attention():
    from diffusion_model_nemo_tpu.ops.attention import fused_attention

    q, k, v = _qkv()
    out = sequence_sharded_attention(q, k, v, mesh=None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fused_attention(q, k, v)))


def test_token_divisibility_error():
    q, k, v = _qkv(N=36)  # not divisible by 8
    mesh = make_mesh(axis_names=("seq",))
    with pytest.raises(ValueError, match="not divisible"):
        sequence_sharded_attention(q, k, v, mesh=mesh, axis_name="seq")


# ---------------------------------------------------------------- DiT -------
_DIT_KW = dict(dim=64, depth=2, heads=4, patch_size=2, channels=3)


@pytest.mark.slow  # 233 s: full token-sharded DiT vs unsharded, fwd+bwd compile x2
def test_dit_sequence_parallel_matches_unsharded():
    mesh = make_mesh(axis_names=("seq",))
    plain = DiT(**_DIT_KW)
    sp = DiT(**_DIT_KW, seq_axis_name="seq")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    params = plain.init(jax.random.PRNGKey(0), x, t)["params"]

    out_sp = sequence_parallel_dit_apply(sp, params, x, t, mesh=mesh)
    out = plain.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out), atol=1e-5)

    def loss_sp(p):
        return (sequence_parallel_dit_apply(sp, p, x, t, mesh=mesh) ** 2).sum()

    def loss_ref(p):
        return (plain.apply({"params": p}, x, t) ** 2).sum()

    g_sp, g_ref = jax.grad(loss_sp)(params), jax.grad(loss_ref)(params)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_sp, g_ref
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4


@pytest.mark.slow  # 47 s warm: conditional token-sharded DiT vs unsharded
def test_dit_sequence_parallel_conditional():
    mesh = make_mesh(axis_names=("seq",))
    plain = DiT(**_DIT_KW, num_classes=10)
    sp = DiT(**_DIT_KW, num_classes=10, seq_axis_name="seq")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    cls = jnp.asarray([1, 4])
    params = plain.init(jax.random.PRNGKey(1), x, t, classes=cls)["params"]
    out_sp = sequence_parallel_dit_apply(sp, params, x, t, cls, mesh=mesh)
    out = plain.apply({"params": params}, x, t, classes=cls)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out), atol=1e-5)


def test_dit_seq_parallel_validation():
    mesh = make_mesh(axis_names=("seq",))
    plain = DiT(**_DIT_KW)  # seq_axis_name not set
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,))
    params = plain.init(jax.random.PRNGKey(0), x, t)["params"]
    with pytest.raises(ValueError, match="seq_axis_name"):
        sequence_parallel_dit_apply(plain, params, x, t, mesh=mesh)
    sp = DiT(**_DIT_KW, seq_axis_name="seq")
    with pytest.raises(ValueError, match="patch rows"):
        sequence_parallel_dit_apply(
            sp, params, jnp.zeros((1, 8, 8, 3)), t, mesh=mesh
        )  # 8 rows / 8 devices = 1 row < patch_size
