"""Fused-op kernels (XLA-fallback path on CPU) vs reference formulas.

On TPU the same entry points dispatch Pallas kernels, verified separately on
hardware; these tests pin the semantics + gradients of the public ops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from diffusion_model_nemo_tpu.ops.attention import attention_reference, fused_attention
from diffusion_model_nemo_tpu.ops.norm import group_norm_silu, group_norm_silu_reference


def test_group_norm_silu_matches_torch():
    """Our GroupNorm numerics must match torch.nn.GroupNorm + SiLU exactly
    (the reference net's building block)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 16).astype(np.float32)
    gamma = rng.randn(16).astype(np.float32)
    beta = rng.randn(16).astype(np.float32)

    ours = np.asarray(group_norm_silu(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 4))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    gn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
        expected = torch.nn.functional.silu(gn(tx)).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_group_norm_silu_film():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))
    scale = jnp.asarray(rng.randn(2, 1, 1, 8).astype(np.float32))
    shift = jnp.asarray(rng.randn(2, 1, 1, 8).astype(np.float32))
    out = group_norm_silu(x, gamma, beta, 2, scale_shift=(scale, shift))
    ref = group_norm_silu_reference(x, gamma, beta, 2, scale=scale, shift=shift)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_group_norm_silu_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    gamma = jnp.ones((8,))
    beta = jnp.zeros((8,))
    g1 = jax.grad(lambda x: group_norm_silu(x, gamma, beta, 2).sum())(x)
    g2 = jax.grad(lambda x: group_norm_silu_reference(x, gamma, beta, 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_group_norm_silu_batch_minor_kernel(monkeypatch):
    """Batch-minor packed GN kernel (interpret mode on CPU) vs the XLA
    reference at the flagship's L0/L1 shapes, bf16 + FiLM + custom_vjp
    grads (backward recomputes through the reference)."""
    monkeypatch.setenv("DMN_TPU_PALLAS_NORM_BM", "interpret")
    rng = np.random.RandomState(4)
    # B=256 exercises the multi-block grid: gamma/beta tiles must pin block
    # (0, 0) for every grid step (ADVICE r4 — a (0, i) map only worked via
    # undocumented out-of-bounds block clamping)
    for B, H, W, C, groups in ((128, 8, 8, 32, 8), (128, 4, 4, 64, 8),
                               (256, 4, 4, 32, 8)):
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
        gamma = jnp.asarray(rng.randn(C).astype(np.float32))
        beta = jnp.asarray(rng.randn(C).astype(np.float32))
        scale = jnp.asarray(rng.randn(B, 1, 1, C).astype(np.float32))
        shift = jnp.asarray(rng.randn(B, 1, 1, C).astype(np.float32))

        out = group_norm_silu(x, gamma, beta, groups)
        ref = group_norm_silu_reference(x, gamma, beta, groups)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )
        out_f = group_norm_silu(x, gamma, beta, groups, scale_shift=(scale, shift))
        ref_f = group_norm_silu_reference(
            x, gamma, beta, groups, scale=scale, shift=shift
        )
        np.testing.assert_allclose(
            np.asarray(out_f, np.float32), np.asarray(ref_f, np.float32), atol=5e-2
        )
    # grads recompute through the reference formula regardless of dispatch
    xs = jnp.asarray(rng.randn(128, 2, 2, 32).astype(np.float32), jnp.bfloat16)
    g1 = jax.grad(
        lambda x: group_norm_silu(x, gamma[:32], beta[:32], 8).astype(jnp.float32).sum()
    )(xs)
    monkeypatch.setenv("DMN_TPU_PALLAS_NORM_BM", "0")
    g2 = jax.grad(
        lambda x: group_norm_silu(x, gamma[:32], beta[:32], 8).astype(jnp.float32).sum()
    )(xs)
    np.testing.assert_allclose(
        np.asarray(g1, np.float32), np.asarray(g2, np.float32), atol=1e-5
    )


def test_fused_attention_matches_reference_and_torch():
    rng = np.random.RandomState(3)
    B, N, h, d = 2, 9, 4, 8
    q = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32)) * d**-0.5
    k = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, h, d).astype(np.float32))
    out = fused_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # vs torch softmax attention
    tq, tk, tv = (torch.from_numpy(np.asarray(a)).permute(0, 2, 1, 3) for a in (q, k, v))
    expected = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, scale=1.0)
    expected = expected.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_fused_attention_gradients():
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 5, 2, 4).astype(np.float32))
    g1 = jax.grad(lambda q: fused_attention(q, k, v).sum())(q)
    g2 = jax.grad(lambda q: attention_reference(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_linear_attention_merged_matches_per_head():
    """The layout-native merged-head formulation (block-diag masked gram)
    must equal the reference per-head einsums exactly in math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_model_nemo_tpu.ops.attention import (
        linear_attention,
        linear_attention_reference,
    )

    key = jax.random.PRNGKey(0)
    B, N, h, d = 2, 64, 4, 32
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, h, d)) for i in range(3))
    q = jax.nn.softmax(q, axis=-1) * d**-0.5
    k = jax.nn.softmax(k, axis=1)
    merged = np.asarray(linear_attention(q, k, v))
    ref = np.asarray(linear_attention_reference(q, k, v))
    np.testing.assert_allclose(merged, ref, rtol=1e-5, atol=1e-6)

    # fallback path for large merged head dims
    qb, kb, vb = (jnp.tile(t, (1, 1, 5, 1)) for t in (q, k, v))  # h*d = 640 > 512
    big = np.asarray(linear_attention(qb, kb, vb))
    big_ref = np.asarray(linear_attention_reference(qb, kb, vb))
    np.testing.assert_allclose(big, big_ref, rtol=1e-5, atol=1e-6)


def test_linear_attention_merged_gradients():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_model_nemo_tpu.ops.attention import (
        linear_attention,
        linear_attention_reference,
    )

    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (1, 16, 4, 32)) for i in range(3))
    g1 = jax.grad(lambda a, b, c: jnp.sum(linear_attention(a, b, c) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b, c: jnp.sum(linear_attention_reference(a, b, c) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):  # fp32 accumulation order differs → loose rtol
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_fused_linear_attention_qkv_kernel_matches_reference(monkeypatch):
    """The Pallas fused linear-attention block (run in interpret mode on CPU)
    must match the XLA reference path on raw qkv conv output."""
    import jax
    import numpy as np
    from diffusion_model_nemo_tpu.ops import attention as A

    key = jax.random.PRNGKey(5)
    B, N, h, d = 2, 64, 4, 32
    qkv = jax.random.normal(key, (B, N, 3 * h * d)) * 2.0
    ref = np.asarray(A.linear_attention_qkv_reference(qkv, h, d, d**-0.5))

    monkeypatch.setenv("DMN_TPU_PALLAS_LINATTN", "interpret")
    out = np.asarray(A.fused_linear_attention_qkv(qkv, h, d, d**-0.5))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # gradient flows through the custom_vjp (reference recompute)
    g = jax.grad(lambda t: A.fused_linear_attention_qkv(t, h, d, d**-0.5).sum())(qkv)
    g_ref = jax.grad(lambda t: A.linear_attention_qkv_reference(t, h, d, d**-0.5).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_linear_attention_block_reference_matches_module_composition():
    """The one-shot block reference (norm → qkv → attn → out → norm → +x)
    must equal the composed flax modules it replaces in SelfAttentionBlock."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_model_nemo_tpu.ops import attention as A

    key = jax.random.PRNGKey(7)
    B, H, W, C, h, d = 2, 8, 8, 32, 4, 32
    hd = h * d
    x = jax.random.normal(key, (B, H * W, C))
    ks = jax.random.split(key, 8)
    ng = jax.random.normal(ks[0], (C,)) * 0.1 + 1.0
    nb = jax.random.normal(ks[1], (C,)) * 0.1
    w_qkv = jax.random.normal(ks[2], (C, 3 * hd)) * C**-0.5
    w_out = jax.random.normal(ks[3], (hd, C)) * hd**-0.5
    b_out = jax.random.normal(ks[4], (C,)) * 0.1
    og = jax.random.normal(ks[5], (C,)) * 0.1 + 1.0
    ob = jax.random.normal(ks[6], (C,)) * 0.1

    got = A.linear_attention_block_reference(
        x, ng, nb, w_qkv, w_out, b_out, og, ob, h, d, d**-0.5
    )

    gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
    hpre = gn.apply({"params": {"scale": ng, "bias": nb}}, x)
    qkv = jnp.dot(hpre, w_qkv)
    attn = A.linear_attention_qkv_reference(qkv, h, d, d**-0.5)
    out = jnp.dot(attn, w_out) + b_out
    out = gn.apply({"params": {"scale": og, "bias": ob}}, out)
    expected = out + x

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)


def test_fused_linear_attention_block_kernel_matches_reference(monkeypatch):
    """Pallas block kernel (interpret mode on CPU) vs the XLA composition,
    in bfloat16 (the production dtype) and with gradients flowing."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_model_nemo_tpu.ops import attention as A

    key = jax.random.PRNGKey(11)
    B, N, C, h, d = 2, 64, 32, 4, 32
    hd = h * d
    ks = jax.random.split(key, 8)
    x = (jax.random.normal(ks[7], (B, N, C))).astype(jnp.bfloat16)
    ng = jax.random.normal(ks[0], (C,)) * 0.1 + 1.0
    nb = jax.random.normal(ks[1], (C,)) * 0.1
    w_qkv = jax.random.normal(ks[2], (C, 3 * hd)) * C**-0.5
    w_out = jax.random.normal(ks[3], (hd, C)) * hd**-0.5
    b_out = jax.random.normal(ks[4], (C,)) * 0.1
    og = jax.random.normal(ks[5], (C,)) * 0.1 + 1.0
    ob = jax.random.normal(ks[6], (C,)) * 0.1
    args = (x, ng, nb, w_qkv, w_out, b_out, og, ob)

    ref = A.linear_attention_block_reference(*args, h, d, d**-0.5).astype(jnp.float32)

    monkeypatch.setenv("DMN_TPU_PALLAS_LINATTN", "interpret")
    out = A.fused_linear_attention_block(*args, h, d, d**-0.5).astype(jnp.float32)
    # bf16 tensors, f32 norms/accumulation in both paths
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)

    g = jax.grad(
        lambda w: A.fused_linear_attention_block(
            x, ng, nb, w, w_out, b_out, og, ob, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(w_qkv)
    g_ref = jax.grad(
        lambda w: A.linear_attention_block_reference(
            x, ng, nb, w, w_out, b_out, og, ob, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(w_qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_self_attention_block_fused_path_params_and_output(monkeypatch):
    """The opt-in whole-block fused path must create the identical parameter
    tree as the composed-module default, and produce the same output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffusion_model_nemo_tpu.modules.parts import SelfAttentionBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    blk = SelfAttentionBlock(linear=True)

    monkeypatch.delenv("DMN_TPU_PALLAS_LINATTN_BLOCK", raising=False)
    params_default = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_default = blk.apply({"params": params_default}, x)

    monkeypatch.setenv("DMN_TPU_PALLAS_LINATTN_BLOCK", "1")
    params_fused = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_fused = blk.apply({"params": params_fused}, x)

    assert jax.tree.structure(params_default) == jax.tree.structure(params_fused)
    for a, b in zip(jax.tree.leaves(params_default), jax.tree.leaves(params_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_default), rtol=1e-5, atol=1e-5
    )


def test_packed_block_kernel_matches_reference():
    """Packed-lane whole-block kernel v5 (interpret mode on CPU) vs the XLA
    composition at every flagship (N, C) it dispatches for, including the
    folded prenorm affine; bf16-seam tolerances."""
    from diffusion_model_nemo_tpu.ops import attention as A

    h, d = 4, 32
    hd = h * d
    for (B, N, C) in [(4, 512, 32), (4, 256, 64), (2, 128, 128)]:
        k = jax.random.PRNGKey(0)
        x = (jax.random.normal(k, (B, N, C)) * 0.5).astype(jnp.bfloat16)
        ks = [jax.random.fold_in(k, i) for i in range(8)]
        ng = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
        nb = 0.1 * jax.random.normal(ks[1], (C,))
        wqkv = jax.random.normal(ks[2], (C, 3 * hd)) * (C**-0.5)
        wout = jax.random.normal(ks[3], (hd, C)) * (hd**-0.5)
        bout = 0.1 * jax.random.normal(ks[4], (C,))
        og = 1.0 + 0.1 * jax.random.normal(ks[5], (C,))
        ob = 0.1 * jax.random.normal(ks[6], (C,))
        args = (x, ng, nb, wqkv, wout, bout, og, ob)
        ref = A.linear_attention_block_reference(*args, h, d, d**-0.5).astype(jnp.float32)
        out = A._pallas_linattn_block_packed(
            *args, h, d, d**-0.5, 1e-5, interpret=True
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


def test_packed_block_gradients_match_reference(monkeypatch):
    """custom_vjp backward recomputes through the XLA composition — grads
    w.r.t. weights must match the reference path."""
    from diffusion_model_nemo_tpu.ops import attention as A

    h, d = 4, 32
    hd = h * d
    B, N, C = 2, 256, 64
    k = jax.random.PRNGKey(0)
    x = (jax.random.normal(k, (B, N, C)) * 0.5).astype(jnp.bfloat16)
    ks = [jax.random.fold_in(k, i) for i in range(8)]
    ng = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
    nb = 0.1 * jax.random.normal(ks[1], (C,))
    wqkv = jax.random.normal(ks[2], (C, 3 * hd)) * (C**-0.5)
    wout = jax.random.normal(ks[3], (hd, C)) * (hd**-0.5)
    bout = 0.1 * jax.random.normal(ks[4], (C,))
    og = 1.0 + 0.1 * jax.random.normal(ks[5], (C,))
    ob = 0.1 * jax.random.normal(ks[6], (C,))

    monkeypatch.setenv("DMN_TPU_PALLAS_LINATTN", "interpret")
    g = jax.grad(
        lambda w: A.fused_linear_attention_block_packed(
            x, ng, nb, w, wout, bout, og, ob, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(wqkv)
    g_ref = jax.grad(
        lambda w: A.linear_attention_block_reference(
            x, ng, nb, w, wout, bout, og, ob, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(wqkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_packed_block_module_dispatch_params_and_output(monkeypatch):
    """SelfAttentionBlock's packed-kernel route (bf16 + dispatch conditions)
    creates the identical parameter tree as the composed default and matches
    its output to bf16-seam tolerance; f32 configs never dispatch."""
    from diffusion_model_nemo_tpu.modules.parts import SelfAttentionBlock
    from diffusion_model_nemo_tpu.ops.attention import use_packed_linattn_block

    # f32 never dispatches (keeps CPU/torch-parity numerics bit-identical)
    assert not use_packed_linattn_block((2, 256, 64), jnp.dtype(jnp.float32), 4, 32)
    # the small-R shapes stay on the v3 route
    assert not use_packed_linattn_block((2, 64, 64), jnp.dtype(jnp.bfloat16), 4, 32)

    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64)) * 0.5).astype(
        jnp.bfloat16
    )
    blk = SelfAttentionBlock(linear=True, dtype=jnp.bfloat16)

    monkeypatch.delenv("DMN_TPU_PALLAS_LINATTN", raising=False)
    params_default = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_default = blk.apply({"params": params_default}, x)

    monkeypatch.setenv("DMN_TPU_PALLAS_LINATTN", "interpret")
    params_packed = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_packed = blk.apply({"params": params_packed}, x)

    assert jax.tree.structure(params_default) == jax.tree.structure(params_packed)
    for a, b in zip(jax.tree.leaves(params_default), jax.tree.leaves(params_packed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out_packed, np.float32),
        np.asarray(out_default, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )


def test_attention_block_reference_matches_module_composition():
    """attention_block_reference (prenorm -> qkv -> sdpa -> out -> +x) must
    equal SelfAttentionBlock(linear=False) exactly (same casts per seam)."""
    from diffusion_model_nemo_tpu.modules.parts import SelfAttentionBlock
    from diffusion_model_nemo_tpu.ops import attention as A

    h, d = 4, 32
    B, H, W, C = 3, 4, 4, 64
    x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 0.5).astype(
        jnp.bfloat16
    )
    blk = SelfAttentionBlock(linear=False, dtype=jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_mod = blk.apply({"params": params}, x)
    ref = A.attention_block_reference(
        x.reshape(B, H * W, C),
        params["norm"]["scale"], params["norm"]["bias"],
        params["attn"]["to_qkv"]["kernel"][0, 0],
        params["attn"]["to_out"]["kernel"][0, 0],
        params["attn"]["to_out"]["bias"],
        h, d, d**-0.5,
    ).reshape(B, H, W, C)
    np.testing.assert_array_equal(
        np.asarray(out_mod, np.float32), np.asarray(ref, np.float32)
    )


def test_small_attn_block_kernel_matches_reference(monkeypatch):
    """Batched bottleneck-attention kernel (interpret mode) vs the XLA
    composition — the stacked-mask sample batching must be exact math
    (cross-sample scores masked to zero probability)."""
    from diffusion_model_nemo_tpu.ops import attention as A

    h, d = 4, 32
    hd = h * d
    for (B, N, C) in [(8, 16, 64), (4, 16, 32), (2, 64, 64)]:
        k = jax.random.PRNGKey(42)
        x = (jax.random.normal(k, (B, N, C)) * 0.5).astype(jnp.bfloat16)
        ks = [jax.random.fold_in(k, i) for i in range(6)]
        ng = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
        nb = 0.1 * jax.random.normal(ks[1], (C,))
        wqkv = jax.random.normal(ks[2], (C, 3 * hd)) * (C**-0.5)
        wout = jax.random.normal(ks[3], (hd, C)) * (hd**-0.5)
        bout = 0.1 * jax.random.normal(ks[4], (C,))
        args = (x, ng, nb, wqkv, wout, bout)
        ref = A.attention_block_reference(*args, h, d, d**-0.5).astype(jnp.float32)
        out = A._pallas_attn_block_small(
            *args, h, d, d**-0.5, 1e-5, interpret=True
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
        )

    # gradient through the custom_vjp recomputes the XLA reference
    monkeypatch.setenv("DMN_TPU_PALLAS_ATTN_BLOCK", "interpret")
    B, N, C = 2, 16, 64
    x = (jax.random.normal(jax.random.PRNGKey(7), (B, N, C)) * 0.5).astype(jnp.bfloat16)
    ng = jnp.ones((C,)); nb = jnp.zeros((C,))
    wqkv = jax.random.normal(jax.random.PRNGKey(8), (C, 3 * hd)) * (C**-0.5)
    wout = jax.random.normal(jax.random.PRNGKey(9), (hd, C)) * (hd**-0.5)
    bout = jnp.zeros((C,))
    g = jax.grad(
        lambda w: A.fused_attention_block_small(
            x, ng, nb, w, wout, bout, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(wqkv)
    g_ref = jax.grad(
        lambda w: A.attention_block_reference(
            x, ng, nb, w, wout, bout, h, d, d**-0.5
        ).astype(jnp.float32).sum()
    )(wqkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_small_attn_block_module_dispatch(monkeypatch):
    """SelfAttentionBlock(linear=False) routes through the fused bottleneck
    kernel when dispatch holds: identical parameter tree, output within
    bf16-seam tolerance; f32 configs never dispatch."""
    from diffusion_model_nemo_tpu.modules.parts import SelfAttentionBlock
    from diffusion_model_nemo_tpu.ops.attention import use_small_attn_block

    assert not use_small_attn_block((2, 16, 64), jnp.dtype(jnp.float32), 4, 32)
    assert not use_small_attn_block((2, 1024, 32), jnp.dtype(jnp.bfloat16), 4, 32)

    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64)) * 0.5).astype(
        jnp.bfloat16
    )
    blk = SelfAttentionBlock(linear=False, dtype=jnp.bfloat16)
    monkeypatch.delenv("DMN_TPU_PALLAS_ATTN_BLOCK", raising=False)
    params_default = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_default = blk.apply({"params": params_default}, x)

    monkeypatch.setenv("DMN_TPU_PALLAS_ATTN_BLOCK", "interpret")
    params_fused = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_fused = blk.apply({"params": params_fused}, x)

    assert jax.tree.structure(params_default) == jax.tree.structure(params_fused)
    for a, b in zip(jax.tree.leaves(params_default), jax.tree.leaves(params_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32),
        np.asarray(out_default, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )


@pytest.mark.slow  # 29 s: interpret-mode kernels over the full shape grid;
# the single-shape packed/small-block tests above keep quick coverage
def test_packed_and_small_block_kernels_shape_sweep():
    """Interpret-mode sweep across every (B, N, C, heads) the dispatchers can
    legally fire for — guards the lane-offset arithmetic (J-token packing,
    stacked masks) against shape-specific bugs the targeted tests miss."""
    from diffusion_model_nemo_tpu.ops import attention as A

    d = 32
    for (B, N, C, h) in [
        (2, 512, 32, 4), (3, 256, 64, 4), (2, 1024, 32, 4),
        (2, 256, 32, 4), (2, 128, 128, 4), (2, 256, 64, 8),
    ]:
        hd = h * d
        k = jax.random.PRNGKey(B * 1000 + N + C + h)
        x = (jax.random.normal(k, (B, N, C)) * 0.5).astype(jnp.bfloat16)
        ks = [jax.random.fold_in(k, i) for i in range(8)]
        ng = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
        nb = 0.1 * jax.random.normal(ks[1], (C,))
        wqkv = jax.random.normal(ks[2], (C, 3 * hd)) * (C**-0.5)
        wout = jax.random.normal(ks[3], (hd, C)) * (hd**-0.5)
        bout = 0.1 * jax.random.normal(ks[4], (C,))
        og = 1.0 + 0.1 * jax.random.normal(ks[5], (C,))
        ob = 0.1 * jax.random.normal(ks[6], (C,))
        ref = A.linear_attention_block_reference(
            x, ng, nb, wqkv, wout, bout, og, ob, h, d, d**-0.5
        ).astype(jnp.float32)
        out = A._pallas_linattn_block_packed(
            x, ng, nb, wqkv, wout, bout, og, ob, h, d, d**-0.5, 1e-5,
            interpret=True,
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2.5e-2, atol=2.5e-2,
            err_msg=f"packed kernel mismatch at B={B} N={N} C={C} h={h}",
        )

    for (B, N, C, h) in [(5, 16, 64, 4), (2, 16, 32, 4), (3, 32, 64, 4), (2, 64, 128, 4)]:
        hd = h * d
        k = jax.random.PRNGKey(B * 999 + N + C)
        x = (jax.random.normal(k, (B, N, C)) * 0.5).astype(jnp.bfloat16)
        ks = [jax.random.fold_in(k, i) for i in range(6)]
        ng = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
        nb = 0.1 * jax.random.normal(ks[1], (C,))
        wqkv = jax.random.normal(ks[2], (C, 3 * hd)) * (C**-0.5)
        wout = jax.random.normal(ks[3], (hd, C)) * (hd**-0.5)
        bout = 0.1 * jax.random.normal(ks[4], (C,))
        ref = A.attention_block_reference(
            x, ng, nb, wqkv, wout, bout, h, d, d**-0.5
        ).astype(jnp.float32)
        out = A._pallas_attn_block_small(
            x, ng, nb, wqkv, wout, bout, h, d, d**-0.5, 1e-5, interpret=True
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2.5e-2, atol=2.5e-2,
            err_msg=f"small-attn kernel mismatch at B={B} N={N} C={C} h={h}",
        )
