"""Fused multi-head self-attention — Pallas TPU kernel with XLA fallback.

Used by the U-Net mid-block (reference parts/mha.py:7-30: 4 heads × 32,
max-subtracted softmax). The kernel fuses qk^T → stable softmax → ·v in one
VMEM pass per (batch·head), with float32 accumulation on the MXU; the
unfused path materializes the [N, N] score tensor in HBM twice.

Dispatch: Pallas on TPU for token counts where a head's working set fits
VMEM (N ≤ ~4096 at d=32); XLA fallback elsewhere (and for autodiff's
backward, via custom_vjp recompute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "fused_attention",
    "attention_reference",
    "linear_attention",
    "linear_attention_reference",
    "fused_linear_attention_qkv",
    "linear_attention_qkv_reference",
    "fused_linear_attention_block",
    "linear_attention_block_reference",
    "fused_linear_attention_block_packed",
    "use_packed_linattn_block",
    "attention_block_reference",
    "fused_attention_block_small",
    "use_small_attn_block",
]

_MAX_PALLAS_TOKENS = 4096
# Below this many tokens the per-sample VMEM loop is grid/latency-bound
# (measured on v5e: N=16 linattn 25.7 us via Pallas vs ~4 us SoL; N=64 runs
# at SoL either way) — the XLA einsum composition batches tiny dots better
# and its layout copies are negligible at these sizes.
_MIN_PALLAS_TOKENS = 64


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, h, d] qkv (q pre-scaled) → [B, N, h, d]; XLA path.

    Matches the reference einsum formulation incl. the stop-gradient max
    subtraction (parts/mha.py:24-28).
    """
    sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn.astype(q.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch·head) per grid step; blocks are [1, N, d] in VMEM."""
    q = q_ref[0].astype(jnp.float32)  # [N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N]
    sim = sim - sim.max(axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / p.sum(axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [N, d]
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_attention(q, k, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, h, d = q.shape

    def merge(x):  # [B, N, h, d] → [B*h, N, d]
        return x.transpose(0, 2, 1, 3).reshape(B * h, N, d)

    spec = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B * h, N, d), q.dtype),
        grid=(B * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(merge(q), merge(k), merge(v))
    return out.reshape(B, h, N, d).transpose(0, 2, 1, 3)


def _use_pallas(q) -> bool:
    """Pallas attention is OPT-IN (DMN_TPU_PALLAS_ATTN=1) below 1k tokens.

    At the CIFAR bottleneck (N=16 tokens) the custom call costs ~0.19 ms/step
    incl. surrounding layout copies vs XLA's fused einsum path; the kernel
    pays off for longer sequences where the [N, N] score tensor would
    otherwise round-trip HBM (auto-enabled from 1024 tokens)."""
    import os

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, N, _, d = q.shape
    if N > _MAX_PALLAS_TOKENS:
        return False
    return N >= 1024 or os.environ.get("DMN_TPU_PALLAS_ATTN") == "1"


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, h, d] (q pre-scaled) → [B, N, h, d] attention output."""
    if _use_pallas(q):
        return _pallas_attention(q, k, v)
    return attention_reference(q, k, v)


def _fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


# ----------------------------------------------------------- linear attn ----
def linear_attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, h, d] (q softmaxed over d & scaled, k softmaxed over N) →
    [B, N, h, d]; the reference's per-head einsum formulation
    (parts/mha.py:51-57)."""
    context = jnp.einsum("bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "bhde,bnhd->bnhe", context.astype(q.dtype), q, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


_MAX_MERGED_HEAD_DIM = 512


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Layout-native linear attention: merged-head matmuls + block-diag mask.

    The per-head einsums ``bnhd,bnhe->bhde`` / ``bhde,bnhd->bnhe`` make XLA
    lay the [B, N, h, d] operands out N-minor, inserting four full-tensor
    layout copies per attention layer (measured 4 × 75 µs/step at N=1024 on
    v5e — ALL of the sampling scan's copy time). Merging heads keeps the
    natural [B, N, h·d] layout (h·d = 128 = one lane tile) for both matmuls:

        gram = Kᵀ·V   [B, h·d, h·d]   contraction over N, operands N-major
        gram ∘= block-diag mask       (zero cross-head products)
        out  = Q·gram [B, N, h·d]

    Identical math to the per-head form (cross-head terms are exactly the
    masked-off blocks) at h× the FLOPs of a tiny op — ~16 µs of extra MXU
    work buys back ~300 µs of copies. Falls back to the per-head form when
    h·d is too large for the FLOP trade to pay."""
    B, N, h, d = q.shape
    if h * d > _MAX_MERGED_HEAD_DIM:
        return linear_attention_reference(q, k, v)
    qm = q.reshape(B, N, h * d)  # minor-dim reshape: a bitcast, not a copy
    km = k.reshape(B, N, h * d)
    vm = v.reshape(B, N, h * d)
    gram = jnp.einsum("bnc,bnk->bck", km, vm, preferred_element_type=jnp.float32)
    mask = jax.scipy.linalg.block_diag(*([jnp.ones((d, d), gram.dtype)] * h))
    gram = gram * mask
    out = jnp.einsum(
        "bnc,bck->bnk", qm, gram.astype(q.dtype), preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype).reshape(B, N, h, d)


# ------------------------------------------- fully fused linear attention ----
def linear_attention_qkv_reference(
    qkv: jnp.ndarray, heads: int, dim_head: int, scale: float
) -> jnp.ndarray:
    """XLA path for the fused linear-attention block: raw qkv conv output
    [B, N, 3·h·d] → [B, N, h·d] (softmaxes + both contractions)."""
    B, N, _ = qkv.shape
    hd = heads * dim_head
    q = qkv[..., :hd].reshape(B, N, heads, dim_head)
    k = qkv[..., hd : 2 * hd].reshape(B, N, heads, dim_head)
    v = qkv[..., 2 * hd :].reshape(B, N, heads, dim_head)
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * scale
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    out = linear_attention(q.astype(qkv.dtype), k.astype(qkv.dtype), v)
    return out.reshape(B, N, hd)


def _linattn_kernel(qkv_ref, o_ref, *, heads: int, dim_head: int, scale: float):
    """One batch element per grid step, everything in VMEM.

    The qkv block arrives in its natural [1, N, 3·h·d] lane layout (no host
    or HBM transposes): Q = lanes [0, hd), K = [hd, 2hd), V = [2hd, 3hd).
    Per-head softmax over d uses a row-max (a constant within each head's
    group, so the softmax is exact) and gets its per-head denominators by a
    matmul with the block-diagonal ones mask — no lane reshapes needed.
    """
    hd = heads * dim_head
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)  # block-diagonal head mask

    # Several batch elements per grid step (unrolled) amortize the per-step
    # grid overhead, which dominates these tiny dots.
    for b in range(qkv_ref.shape[0]):
        x = qkv_ref[b]
        q = x[:, :hd].astype(jnp.float32)
        k = x[:, hd : 2 * hd].astype(jnp.float32)
        v = x[:, 2 * hd :].astype(jnp.float32)

        # softmax over d within each head (row max is one constant per row →
        # constant within every head group → exact); per-head sums broadcast
        # to the head's lanes via the mask matmul.
        qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
        q_den = jax.lax.dot_general(
            qe, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        q_sm = qe / q_den * scale

        # softmax over N per (head, channel) column
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)

        gram = jax.lax.dot_general(
            k_sm, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [hd, hd]; cross-head blocks are masked off
        gram = gram * mask
        out = jax.lax.dot_general(
            q_sm, gram, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[b] = out.astype(o_ref.dtype)


def _pallas_linear_attention(qkv, heads, dim_head, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C3 = qkv.shape
    hd = heads * dim_head
    # Pick the largest per-step batch block whose working set (~N·C3·6B for
    # the bf16 input + f32 intermediates, per element; the unrolled loop
    # keeps only ~one element's intermediates live) stays inside VMEM.
    budget = 12 * 1024 * 1024
    block_b = max(min(B, budget // max(N * C3 * 6, 1)), 1)
    while B % block_b:
        block_b -= 1
    kernel = functools.partial(_linattn_kernel, heads=heads, dim_head=dim_head, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, hd), qkv.dtype),
        grid=(B // block_b,),
        in_specs=[pl.BlockSpec((block_b, N, C3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, N, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv)


def _use_pallas_linattn(qkv, heads, dim_head) -> bool:
    """Auto-on on TPU: unlike the merge-transpose attention kernel, this one
    consumes the qkv tensor in its natural layout (operand = the 1×1-conv
    output bitcast), so there are no custom-call layout copies to pay for.
    Measured on v5e at dim-32/B=128 it removes the ~0.3 ms/step of layout
    copies XLA inserts around the per-head einsum formulation. Opt-out:
    DMN_TPU_PALLAS_LINATTN=0."""
    import os

    if os.environ.get("DMN_TPU_PALLAS_LINATTN") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return os.environ.get("DMN_TPU_PALLAS_LINATTN") == "interpret"
    B, N, _ = qkv.shape
    hd = heads * dim_head
    return (
        hd % 128 == 0
        and N % 8 == 0
        and _MIN_PALLAS_TOKENS <= N <= _MAX_PALLAS_TOKENS
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_linear_attention_qkv(
    qkv: jnp.ndarray, heads: int, dim_head: int, scale: float
) -> jnp.ndarray:
    """Fused linear-attention block: [B, N, 3·h·d] qkv → [B, N, h·d].

    Pallas on TPU (softmaxes + both matmuls in one VMEM pass per batch
    element, natural layouts in and out); XLA fallback elsewhere. Reverse
    mode recomputes through the XLA path (custom_vjp — do not jvp)."""
    if _use_pallas_linattn(qkv, heads, dim_head):
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _pallas_linear_attention(qkv, heads, dim_head, scale, interpret=interpret)
    return linear_attention_qkv_reference(qkv, heads, dim_head, scale)


def _linattn_fwd(qkv, heads, dim_head, scale):
    return fused_linear_attention_qkv(qkv, heads, dim_head, scale), qkv


def _linattn_bwd(heads, dim_head, scale, qkv, g):
    _, vjp = jax.vjp(lambda t: linear_attention_qkv_reference(t, heads, dim_head, scale), qkv)
    return vjp(g)


fused_linear_attention_qkv.defvjp(_linattn_fwd, _linattn_bwd)


# -------------------------------------- fully fused linear-attention BLOCK ----
def _gn1(x, gamma, beta, eps):
    """flax ``nn.GroupNorm(num_groups=1)`` numerics on [B, N, C]: float32
    fast-variance stats over (N, C) clipped at zero, float32 normalize+affine,
    result cast back to the input dtype (normalization.py `_compute_stats` /
    `_normalize`)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def linear_attention_block_reference(
    x: jnp.ndarray,
    norm_gamma: jnp.ndarray,
    norm_beta: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    out_gamma: jnp.ndarray,
    out_beta: jnp.ndarray,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """XLA path for the whole ``Residual(PreNorm(LinearAttention))`` block:
    [B, N, C] → GroupNorm(1) → qkv matmul ([C, 3·h·d]) → linear attention →
    out matmul ([h·d, C]) + bias → GroupNorm(1) → + x. Exactly the module
    composition in parts.py:SelfAttentionBlock (same casts at each seam)."""
    h = _gn1(x, norm_gamma, norm_beta, eps)
    qkv = jnp.dot(h, w_qkv.astype(h.dtype))
    attn = linear_attention_qkv_reference(qkv, heads, dim_head, scale)
    out = jnp.dot(attn.astype(x.dtype), w_out.astype(x.dtype)) + b_out.astype(x.dtype)
    out = _gn1(out, out_gamma, out_beta, eps)
    return out + x


def _linattn_block_kernel(
    x_ref, ng_ref, nb_ref, wqkv_ref, wout_ref, bout_ref, og_ref, ob_ref, o_ref,
    *, heads: int, dim_head: int, scale: float, eps: float,
):
    """Entire linear-attention block per batch element, one VMEM pass.

    Replaces prenorm stats+apply, the qkv projection, the attention
    contractions, the out projection, the out-norm stats+apply, and the
    residual add — currently ≥6 HBM round trips of the [N, C]/[N, 3·h·d]
    tensors — with one read of x and one write of the result. Matmul inputs
    are cast to bfloat16 (float32 accumulation), matching the XLA reference
    path's seams; norms are float32.
    """
    hd = heads * dim_head
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)  # block-diagonal head mask

    wqkv = wqkv_ref[...].astype(jnp.bfloat16)
    wout = wout_ref[...].astype(jnp.bfloat16)
    bout = bout_ref[...].astype(jnp.float32)
    ng = ng_ref[...].astype(jnp.float32)
    nb = nb_ref[...].astype(jnp.float32)
    og = og_ref[...].astype(jnp.float32)
    ob = ob_ref[...].astype(jnp.float32)

    for b in range(x_ref.shape[0]):
        x = x_ref[b].astype(jnp.float32)  # [N, C]
        n_elems = x.shape[0] * x.shape[1]

        # PreNorm: GroupNorm(1) over the whole sample, f32 fast variance.
        mean = jnp.sum(x) / n_elems
        mean2 = jnp.sum(x * x) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        h = (x - mean) * jax.lax.rsqrt(var + eps) * ng + nb

        qkv = jax.lax.dot_general(
            h.astype(jnp.bfloat16), wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, 3hd]
        q = qkv[:, :hd]
        k = qkv[:, hd : 2 * hd]
        v = qkv[:, 2 * hd :]

        # per-head softmax over d (row max constant within head groups);
        # per-head denominators via the block-diagonal ones matmul.
        qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
        q_den = jax.lax.dot_general(
            qe, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        q_sm = qe / q_den * scale

        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)

        gram = jax.lax.dot_general(
            k_sm.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [hd, hd]
        gram = gram * mask
        attn = jax.lax.dot_general(
            q_sm.astype(jnp.bfloat16), gram.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [N, hd]

        y = jax.lax.dot_general(
            attn.astype(jnp.bfloat16), wout, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout  # [N, C]

        mean = jnp.sum(y) / n_elems
        mean2 = jnp.sum(y * y) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        out = ((y - mean) * jax.lax.rsqrt(var + eps)) * og + ob

        o_ref[b] = (out + x).astype(o_ref.dtype)


def _pallas_linear_attention_block(
    x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps, interpret=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    hd = heads * dim_head
    # Working set per element ≈ f32 x + qkv + attn intermediates; keep a few
    # elements per grid step to amortize grid overhead at small N.
    per_elem = (N * C * 2 + N * 3 * hd) * 4 + N * C * 2
    budget = 12 * 1024 * 1024
    block_b = max(min(B, budget // max(per_elem, 1)), 1)
    while B % block_b:
        block_b -= 1

    kernel = functools.partial(
        _linattn_block_kernel, heads=heads, dim_head=dim_head, scale=scale, eps=eps
    )
    vec_spec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat_spec = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sample_spec = pl.BlockSpec((block_b, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B // block_b,),
        in_specs=[
            sample_spec,
            vec_spec(C), vec_spec(C),
            mat_spec(C, 3 * hd), mat_spec(hd, C), vec_spec(C),
            vec_spec(C), vec_spec(C),
        ],
        out_specs=sample_spec,
        interpret=interpret,
    )(x, ng, nb, wqkv, wout, bout, og, ob)


def _use_pallas_linattn_block(x, heads, dim_head) -> bool:
    """Auto-on on TPU under the same conditions as the qkv kernel (natural
    layouts in and out, h·d a multiple of the 128-lane tile). The kernel
    feeds the MXU in bfloat16, so dispatch only fires for bfloat16 inputs —
    under a float32 compute config the XLA composition (which matmuls in
    x.dtype) keeps full precision and matches the custom_vjp backward.
    Opt-out: DMN_TPU_PALLAS_LINATTN=0 (same switch as the qkv kernel)."""
    import os

    if os.environ.get("DMN_TPU_PALLAS_LINATTN") == "0":
        return False
    if x.dtype != jnp.bfloat16:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return os.environ.get("DMN_TPU_PALLAS_LINATTN") == "interpret"
    B, N, C = x.shape
    hd = heads * dim_head
    return (
        hd % 128 == 0
        and N % 8 == 0
        and _MIN_PALLAS_TOKENS <= N <= _MAX_PALLAS_TOKENS
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_linear_attention_block(
    x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
    heads: int, dim_head: int, scale: float, eps: float = 1e-5,
):
    """Whole ``Residual(PreNorm(LinearAttention))`` block on [B, N, C].

    Pallas on TPU — one VMEM pass per batch element covering both GroupNorms,
    both projections, and the attention contractions; XLA module-equivalent
    composition elsewhere. Reverse mode recomputes through the XLA path
    (custom_vjp — do not jvp)."""
    if _use_pallas_linattn_block(x, heads, dim_head):
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _pallas_linear_attention_block(
            x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
            heads, dim_head, scale, eps, interpret=interpret,
        )
    return linear_attention_block_reference(
        x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
        heads, dim_head, scale, eps,
    )


def _linattn_block_fwd(x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps):
    out = fused_linear_attention_block(
        x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps
    )
    return out, (x, ng, nb, wqkv, wout, bout, og, ob)


def _linattn_block_bwd(heads, dim_head, scale, eps, res, g):
    x, ng, nb, wqkv, wout, bout, og, ob = res
    _, vjp = jax.vjp(
        lambda *a: linear_attention_block_reference(*a, heads, dim_head, scale, eps),
        x, ng, nb, wqkv, wout, bout, og, ob,
    )
    return vjp(g)


fused_linear_attention_block.defvjp(_linattn_block_fwd, _linattn_block_bwd)


# ---------------------------- linear-attention block v2 (token-batched) ------
def _linattn_block_kernel_v2(
    x_ref, ng_ref, nb_ref, wqkv_ref, wout_ref, bout_ref, og_ref, ob_ref, o_ref,
    *, heads: int, dim_head: int, scale: float, eps: float,
):
    """G samples per grid step; every token-wise GEMM (qkv, out projection)
    runs batched over all G·N rows — the v1 kernel's per-sample [N,C] dots
    serialized B tiny MXU launches per step, which is why it lost (see
    SelfAttentionBlock). Only the per-sample softmax/gram stages loop over
    G, on 2-D row slabs (Mosaic's layout inference rejects >2-D vectors
    here). Seam dtypes mirror the composed path exactly: f32 norms and
    softmaxes, bf16 (x.dtype) matmul operands with f32 accumulation."""
    G, N, C = x_ref.shape
    hd = heads * dim_head
    M = G * N
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)

    ng = ng_ref[0].astype(jnp.float32)
    nb = nb_ref[0].astype(jnp.float32)
    og = og_ref[0].astype(jnp.float32)
    ob = ob_ref[0].astype(jnp.float32)
    n_elems = N * C

    xf = x_ref[...].reshape(M, C).astype(jnp.float32)
    h_slabs = []
    for g in range(G):
        sl = xf[g * N : (g + 1) * N]
        mean = jnp.sum(sl) / n_elems
        mean2 = jnp.sum(sl * sl) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        h_slabs.append(((sl - mean) * jax.lax.rsqrt(var + eps)) * ng + nb)
    h = jnp.concatenate(h_slabs, axis=0) if G > 1 else h_slabs[0]

    qkv = jax.lax.dot_general(
        h.astype(o_ref.dtype),
        wqkv_ref[...].astype(o_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 3hd] f32

    q = qkv[:, :hd]
    qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
    q_den = jax.lax.dot_general(
        qe, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    q_sm = (qe / q_den * scale).astype(o_ref.dtype)  # [M, hd]

    attn_slabs = []
    for g in range(G):
        k = qkv[g * N : (g + 1) * N, hd : 2 * hd]
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = (ke / jnp.sum(ke, axis=0, keepdims=True)).astype(o_ref.dtype)
        v = qkv[g * N : (g + 1) * N, 2 * hd :].astype(o_ref.dtype)
        gram = jax.lax.dot_general(
            k_sm, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        gram = (gram * mask).astype(o_ref.dtype)
        attn_slabs.append(
            jax.lax.dot_general(
                q_sm[g * N : (g + 1) * N], gram, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        )
    attn = jnp.concatenate(attn_slabs, axis=0) if G > 1 else attn_slabs[0]

    y = jax.lax.dot_general(
        attn,
        wout_ref[...].astype(o_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[0].astype(jnp.float32)  # [M, C] f32

    for g in range(G):
        sl = y[g * N : (g + 1) * N]
        mean = jnp.sum(sl) / n_elems
        mean2 = jnp.sum(sl * sl) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        out = ((sl - mean) * jax.lax.rsqrt(var + eps)) * og + ob
        o_ref[g] = (out + xf[g * N : (g + 1) * N]).astype(o_ref.dtype)


def _pallas_linear_attention_block_v2(
    x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps,
    block_g=None, interpret=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    hd = heads * dim_head
    if block_g is None:
        # f32 qkv dominates the per-sample VMEM working set
        per_sample = N * (3 * hd * 4 + hd * 3 * 2 + 2 * hd * 4 + C * 8)
        block_g = max(min(B, (9 * 1024 * 1024) // max(per_sample, 1)), 1)
        while B % block_g:
            block_g -= 1

    kernel = functools.partial(
        _linattn_block_kernel_v2, heads=heads, dim_head=dim_head, scale=scale, eps=eps
    )
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_g, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B // block_g,),
        in_specs=[
            blk,
            row(C), row(C),
            mat(C, 3 * hd), mat(hd, C), row(C),
            row(C), row(C),
        ],
        out_specs=blk,
        interpret=interpret,
    )(
        x,
        ng.reshape(1, -1), nb.reshape(1, -1),
        wqkv, wout, bout.reshape(1, -1),
        og.reshape(1, -1), ob.reshape(1, -1),
    )


# ------------------- qkv-projection-fused linear attention (kernel v3) -------
def _linattn_qkv_fused_kernel(
    h_ref, wqkv_ref, o_ref, *, heads: int, dim_head: int, scale: float,
):
    """[G, N, C] pre-normed tokens → [G, N, h·d] attention output, with the
    qkv projection INSIDE the kernel. The composed path materializes the
    [B, N, 3·h·d] qkv tensor to HBM (100 MB at the flagship level-0 shape —
    its read alone is the single most expensive op in the sampler profile at
    132 µs/step); here qkv lives only in VMEM. Token-wise GEMMs batch over
    all G·N rows; per-sample softmax/gram stages loop over 2-D row slabs."""
    G, N, C = h_ref.shape
    hd = heads * dim_head
    M = G * N
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)

    h = h_ref[...].reshape(M, C)
    qkv = jax.lax.dot_general(
        h,
        wqkv_ref[...].astype(h.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, 3hd] f32 — never leaves VMEM

    q = qkv[:, :hd]
    qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
    q_den = jax.lax.dot_general(
        qe, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    q_sm = (qe / q_den * scale).astype(o_ref.dtype)

    for g in range(G):
        k = qkv[g * N : (g + 1) * N, hd : 2 * hd]
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k_sm = (ke / jnp.sum(ke, axis=0, keepdims=True)).astype(o_ref.dtype)
        v = qkv[g * N : (g + 1) * N, 2 * hd :].astype(o_ref.dtype)
        gram = jax.lax.dot_general(
            k_sm, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        gram = (gram * mask).astype(o_ref.dtype)
        o_ref[g] = jax.lax.dot_general(
            q_sm[g * N : (g + 1) * N], gram, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pallas_linattn_qkv_fused(h, wqkv, heads, dim_head, scale, block_g=None, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = h.shape
    hd = heads * dim_head
    if block_g is None:
        per_sample = N * (3 * hd * 4 + 3 * hd * 4 + hd * 2 + C * 2)
        block_g = max(min(B, (8 * 1024 * 1024) // max(per_sample, 1)), 1)
        while B % block_g:
            block_g -= 1
    kernel = functools.partial(
        _linattn_qkv_fused_kernel, heads=heads, dim_head=dim_head, scale=scale
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, hd), h.dtype),
        grid=(B // block_g,),
        in_specs=[
            pl.BlockSpec((block_g, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_g, N, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h, wqkv)


def _use_pallas_linattn_tokens(h, heads, dim_head) -> bool:
    """v3 auto-on: same conditions as the qkv kernel (bf16 MXU feed, full
    128-lane h·d, N large enough that per-sample stages aren't grid-bound)."""
    import os

    if os.environ.get("DMN_TPU_PALLAS_LINATTN") == "0":
        return False
    if h.dtype != jnp.bfloat16:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return os.environ.get("DMN_TPU_PALLAS_LINATTN") == "interpret"
    B, N, C = h.shape
    hd = heads * dim_head
    return (
        hd % 128 == 0
        and N % 8 == 0
        and _MIN_PALLAS_TOKENS <= N <= _MAX_PALLAS_TOKENS
    )


def _linattn_tokens_block_g(h, heads, dim_head) -> int:
    B, N, C = h.shape
    hd = heads * dim_head
    per_sample = N * (3 * hd * 4 + 3 * hd * 4 + hd * 2 + C * 2)
    g = max(min(B, (14 * 1024 * 1024) // max(per_sample, 1)), 1)
    while B % g:
        g -= 1
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_linear_attention_tokens(
    h: jnp.ndarray, wqkv: jnp.ndarray, heads: int, dim_head: int, scale: float
) -> jnp.ndarray:
    """[B, N, C] pre-normed tokens + qkv weight [C, 3·h·d] → [B, N, h·d],
    with the qkv projection fused into the attention kernel.

    On TPU the composed path materializes the [B, N, 3·h·d] qkv tensor to
    HBM — 100 MB at the flagship 32×32 level, whose read back is the single
    most expensive op in the sampler profile (132 µs/step on v5e). The v3
    kernel computes qkv in VMEM per block of samples (measured −8% on the
    projection+attention pair at [128,1024,32]). Reverse mode recomputes
    through the XLA composition (custom_vjp — do not jvp)."""
    if _use_pallas_linattn_tokens(h, heads, dim_head):
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _pallas_linattn_qkv_fused(
            h, wqkv, heads, dim_head, scale,
            block_g=_linattn_tokens_block_g(h, heads, dim_head),
            interpret=interpret,
        )
    qkv = jnp.dot(h, wqkv.astype(h.dtype))
    return fused_linear_attention_qkv(qkv, heads, dim_head, scale)


def _linattn_tokens_fwd(h, wqkv, heads, dim_head, scale):
    return fused_linear_attention_tokens(h, wqkv, heads, dim_head, scale), (h, wqkv)


def _linattn_tokens_bwd(heads, dim_head, scale, res, g):
    h, wqkv = res
    _, vjp = jax.vjp(
        lambda hh, ww: linear_attention_qkv_reference(
            jnp.dot(hh, ww.astype(hh.dtype)), heads, dim_head, scale
        ),
        h,
        wqkv,
    )
    return vjp(g)


fused_linear_attention_tokens.defvjp(_linattn_tokens_fwd, _linattn_tokens_bwd)


# ----------------- packed-lane fused linear-attention BLOCK (kernel v5) ------
#
# Why another block kernel: at the flagship's level-0 shape the whole U-Net
# graph is laid out BATCH-minor by XLA (B=128 fills the 128 lanes; convs and
# norms love it), while Pallas custom calls require row-major C-minor
# operands. Every kernel therefore pays an XLA repack copy on the way in —
# and because C=32 < 128 lanes, the repacked [B, N, C] tile pads lanes 4x:
# the copy writes 33.6 MB for an 8.4 MB tensor and the kernel reads the
# padded bytes back (copy.322 = 104 us/step + part of attn.35's 179 us in
# the sampler profile). Mosaic cannot relayout lanes->sublanes in-kernel
# (vector reshape [G,N*C/128,128]->[G*N,C] is rejected), so the fix is to
# keep the PACKED view [B, N*C/128, 128] end to end: J = 128/C consecutive
# tokens per 128-lane row, q/k/v features of token j at lane offset j*3hd —
# every internal slice lands on a 128-lane boundary, and the projections
# become block-diagonal weights (J copies of W) so the matmuls contract over
# the full 128-lane row (K=128, vs K=C=32 in the v3 kernel). The prenorm
# affine folds into the qkv weight (h@W = xn@(gamma*W) + beta@W), so the
# kernel's norm stage is pure per-sample scalar math. Both repack copies
# shrink to unpadded 8.4 MB->8.4 MB, and the prenorm stats, out projection,
# out norm, and residual all ride along in VMEM.
def _packed_block_weights(
    norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta, j: int
):
    """J-token block-diagonal/tiled params for the packed kernel. All are
    functions of parameters only — XLA hoists them out of the sampling scan
    (one construction per compiled call, not per step)."""
    wq = norm_gamma.astype(jnp.float32)[:, None] * w_qkv.astype(jnp.float32)
    wq4 = jax.scipy.linalg.block_diag(*([wq] * j))  # [J*C, J*3hd]
    bq4 = jnp.tile(norm_beta.astype(jnp.float32) @ w_qkv.astype(jnp.float32), j)
    wo4 = jax.scipy.linalg.block_diag(*([w_out.astype(jnp.float32)] * j))  # [J*hd, J*C]
    bo4 = jnp.tile(b_out.astype(jnp.float32), j)
    og4 = jnp.tile(out_gamma.astype(jnp.float32), j)
    ob4 = jnp.tile(out_beta.astype(jnp.float32), j)
    return wq4, bq4, wo4, bo4, og4, ob4


def _linattn_block_packed_kernel(
    x_ref, wq4_ref, bq4_ref, wo4_ref, bo4_ref, og4_ref, ob4_ref, o_ref,
    *, heads: int, dim_head: int, scale: float, eps: float,
    n_tokens: int, channels: int,
):
    """Whole Residual(PreNorm(LinearAttention)) block on the packed view.

    Blocks are [G, R, 128] with R = N*C/128; row r of sample g holds tokens
    J*r..J*r+J-1, token slot j at lanes [j*C, (j+1)*C). After the qkv matmul
    rows hold J tokens' qkv at lane offsets j*3hd (3hd = 384 = 3 lane
    tiles), so every slice below is 128-aligned. Seam dtypes mirror the XLA
    composition: f32 norms/softmaxes, bf16 matmul operands, f32 accumulate.
    """
    G, R, L = x_ref.shape
    hd = heads * dim_head
    S = 3 * hd
    J = L // channels
    n_elems = n_tokens * channels
    ri = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    ci = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    mask = (ri == ci).astype(jnp.float32)

    xf = x_ref[...].reshape(G * R, L).astype(jnp.float32)
    h_slabs = []
    for g in range(G):
        sl = xf[g * R : (g + 1) * R]
        mean = jnp.sum(sl) / n_elems
        mean2 = jnp.sum(sl * sl) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        h_slabs.append((sl - mean) * jax.lax.rsqrt(var + eps))
    h = (jnp.concatenate(h_slabs, axis=0) if G > 1 else h_slabs[0]).astype(o_ref.dtype)

    qkv = jax.lax.dot_general(
        h, wq4_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq4_ref[0]  # [G*R, J*S] f32

    # q softmax per token over its hd lanes (per-head denominators via the
    # block-diagonal ones matmul; row max is a per-token constant -> exact).
    qsm = []
    for j in range(J):
        qj = qkv[:, j * S : j * S + hd]
        qe = jnp.exp(qj - jnp.max(qj, axis=1, keepdims=True))
        den = jax.lax.dot_general(
            qe, mask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        qsm.append((qe / den * scale).astype(o_ref.dtype))

    att_slabs = []
    for g in range(G):
        lo, hi = g * R, (g + 1) * R
        km = None  # k max over all N tokens: rows AND token slots
        for j in range(J):
            kj = qkv[lo:hi, j * S + hd : j * S + 2 * hd]
            m = jnp.max(kj, axis=0, keepdims=True)
            km = m if km is None else jnp.maximum(km, m)
        kes, ssum = [], None
        for j in range(J):
            kj = qkv[lo:hi, j * S + hd : j * S + 2 * hd]
            ke = jnp.exp(kj - km)
            kes.append(ke)
            s = jnp.sum(ke, axis=0, keepdims=True)
            ssum = s if ssum is None else ssum + s
        # One K=N gram matmul per sample: row-concat the J token slots
        # instead of summing J separate K=R dots (J tiny dots serialize the
        # MXU at small R; the concat is a supported sublane-merge).
        ksm_cat = jnp.concatenate(
            [(kes[j] / ssum).astype(o_ref.dtype) for j in range(J)], axis=0
        ) if J > 1 else (kes[0] / ssum).astype(o_ref.dtype)
        v_cat = jnp.concatenate(
            [
                qkv[lo:hi, j * S + 2 * hd : j * S + 3 * hd].astype(o_ref.dtype)
                for j in range(J)
            ],
            axis=0,
        ) if J > 1 else qkv[lo:hi, 2 * hd : 3 * hd].astype(o_ref.dtype)
        gram = jax.lax.dot_general(
            ksm_cat, v_cat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        gram = (gram * mask).astype(o_ref.dtype)
        outs = [
            jax.lax.dot_general(
                qsm[j][lo:hi], gram, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
            for j in range(J)
        ]
        att_slabs.append(jnp.concatenate(outs, axis=1) if J > 1 else outs[0])
    att = jnp.concatenate(att_slabs, axis=0) if G > 1 else att_slabs[0]  # [G*R, J*hd]

    y = jax.lax.dot_general(
        att, wo4_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo4_ref[0]  # [G*R, L] f32

    og = og4_ref[0]
    ob = ob4_ref[0]
    for g in range(G):
        sl = y[g * R : (g + 1) * R]
        mean = jnp.sum(sl) / n_elems
        mean2 = jnp.sum(sl * sl) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        out = ((sl - mean) * jax.lax.rsqrt(var + eps)) * og + ob
        o_ref[g] = (out + xf[g * R : (g + 1) * R]).astype(o_ref.dtype)


def _pallas_linattn_block_packed(
    x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps, interpret=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    hd = heads * dim_head
    J = 128 // C
    R = (N * C) // 128
    wq4, bq4, wo4, bo4, og4, ob4 = _packed_block_weights(
        ng, nb, wqkv, wout, bout, og, ob, J
    )
    # Per-sample working set: f32 qkv [N,3hd] dominates, plus f32 x/y slabs,
    # bf16 h/qsm/att, and the J per-sample k-softmax buffers. Weights
    # (~1 MB) stay resident across grid steps.
    per_sample = N * (3 * hd * 4 + 2 * C * 4 + 2 * hd * 4 + 3 * hd * 2 + C * 2)
    block_g = max(min(B, (12 * 1024 * 1024) // max(per_sample, 1)), 1)
    while B % block_g:
        block_g -= 1

    kernel = functools.partial(
        _linattn_block_packed_kernel, heads=heads, dim_head=dim_head,
        scale=scale, eps=eps, n_tokens=N, channels=C,
    )
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_g, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, 128), x.dtype),
        grid=(B // block_g,),
        in_specs=[
            blk,
            mat(128, J * 3 * hd), row(J * 3 * hd),
            mat(J * hd, 128), row(128),
            row(128), row(128),
        ],
        out_specs=blk,
        interpret=interpret,
    )(
        x.reshape(B, R, 128),
        wq4, bq4.reshape(1, -1), wo4, bo4.reshape(1, -1),
        og4.reshape(1, -1), ob4.reshape(1, -1),
    )
    return out.reshape(B, N, C)


def use_packed_linattn_block(shape, dtype, heads: int, dim_head: int) -> bool:
    """v5 dispatch: packed-lane whole-block kernel. Auto-on on TPU for bf16
    inputs whose channel count divides the 128-lane tile (the flagship's
    C=32/64 levels) — these are exactly the shapes where the C-minor repack
    pads lanes and the v3 route pays for it. Opt-out: DMN_TPU_PALLAS_LINATTN=0
    (all linattn kernels) or DMN_TPU_PALLAS_LINATTN_PACKED=0 (just this one).
    """
    import os

    if os.environ.get("DMN_TPU_PALLAS_LINATTN") == "0":
        return False
    if os.environ.get("DMN_TPU_PALLAS_LINATTN_PACKED") == "0":
        return False
    if dtype != jnp.bfloat16:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return os.environ.get("DMN_TPU_PALLAS_LINATTN") == "interpret"
    B, N, C = shape
    hd = heads * dim_head
    return (
        hd % 128 == 0
        and C <= 128
        and 128 % C == 0
        and (N * C) % 128 == 0
        # Measured on v5e (B=128): the packed route wins where the repack
        # copies are large and the per-sample slabs keep the MXU fed
        # (R = N*C/128 >= 64: 250+12 us vs 104+179 at [1024,32]); at
        # [64,64] (R=32) the J-split slices and small-M dots make it 2.4x
        # slower than the v3 qkv-fused route, which stays the dispatch.
        and (N * C) // 128 >= 64
        and _MIN_PALLAS_TOKENS <= N <= _MAX_PALLAS_TOKENS
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_linear_attention_block_packed(
    x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
    heads: int, dim_head: int, scale: float, eps: float = 1e-5,
):
    """Packed-lane Residual(PreNorm(LinearAttention)) block on [B, N, C].

    Pallas on TPU when `use_packed_linattn_block` holds (callers check it
    first so the f32/CPU module path stays bit-identical); XLA
    module-equivalent composition otherwise. Reverse mode recomputes through
    the XLA path (custom_vjp — do not jvp). The prenorm affine is folded
    into the qkv projection, so the forward rounds (x-mu)*rstd to bf16
    before gamma/beta instead of after — covered by the kernel tolerance
    tests like the other bf16 seams."""
    if use_packed_linattn_block(x.shape, x.dtype, heads, dim_head):
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _pallas_linattn_block_packed(
            x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
            heads, dim_head, scale, eps, interpret=interpret,
        )
    return linear_attention_block_reference(
        x, norm_gamma, norm_beta, w_qkv, w_out, b_out, out_gamma, out_beta,
        heads, dim_head, scale, eps,
    )


def _linattn_packed_fwd(x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps):
    out = fused_linear_attention_block_packed(
        x, ng, nb, wqkv, wout, bout, og, ob, heads, dim_head, scale, eps
    )
    return out, (x, ng, nb, wqkv, wout, bout, og, ob)


def _linattn_packed_bwd(heads, dim_head, scale, eps, res, g):
    x, ng, nb, wqkv, wout, bout, og, ob = res
    _, vjp = jax.vjp(
        lambda *a: linear_attention_block_reference(*a, heads, dim_head, scale, eps),
        x, ng, nb, wqkv, wout, bout, og, ob,
    )
    return vjp(g)


fused_linear_attention_block_packed.defvjp(_linattn_packed_fwd, _linattn_packed_bwd)


# ------------------------- fused FULL-attention block (bottleneck, small N) --
def attention_block_reference(
    x: jnp.ndarray,
    norm_gamma: jnp.ndarray,
    norm_beta: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """XLA path for ``Residual(PreNorm(Attention))`` on [B, N, C]: GroupNorm(1)
    -> qkv matmul -> max-subtracted softmax attention -> out matmul + bias ->
    + x. Exactly the module composition in parts.py:SelfAttentionBlock
    (linear=False), same casts at each seam."""
    B, N, C = x.shape
    hd = heads * dim_head
    h = _gn1(x, norm_gamma, norm_beta, eps)
    qkv = jnp.dot(h, w_qkv.astype(h.dtype)).reshape(B, N, 3, heads, dim_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = attention_reference(q * scale, k, v)
    out = out.astype(x.dtype).reshape(B, N, hd)
    out = jnp.dot(out, w_out.astype(x.dtype)) + b_out.astype(x.dtype)
    return out + x


def _attn_block_small_kernel(
    x_ref, wq_ref, bq_ref, wo_ref, bo_ref, kvm_ref, sm_ref, grp_ref, o_ref,
    *, heads: int, dim_head: int, scale: float, eps: float,
):
    """Whole bottleneck attention block, G samples per grid step.

    The XLA composition at the mid-block's [128, 16, 4, 32] shapes spends
    ~77 us/step almost entirely in layout copies and a 33 us qk^T "dot"
    fusion (4 MFLOP!) — the per-head einsums force batch-minor<->head-major
    transposes of tiny tensors 1000 times per chain. Here the per-head AND
    per-sample structure is expressed with STACKED masked operands so every
    matmul batches over all G samples (per-sample loops would serialize
    2*G tiny MXU dots) and no reshape ever crosses lanes:

        KV_stack[(g, h, j), d] = k_g[j, d] * (d in head h)   [G*heads*N, hd]
        S[(g, i), (g', h, j)] = q_g[i] . KV_stack * scale     (cross-sample
            columns masked to -1e9 before the row max, so their exp is 0)
        P = exp(S - rowmax(S)) / (P @ samehead-samesample-mask)
        out[(g, i)] = P[(g, i)] @ V_stack                     (cross-sample
            P entries are exactly 0)

    The G^2 score block is tiny (G*N x G*heads*N) and rides the otherwise
    idle MXU. The prenorm affine is folded into the qkv weight; out
    projection + bias and the residual ride along. f32 softmax, bf16 MXU
    operands, f32 accumulation — same seams as the composed path."""
    G, N, C = x_ref.shape
    hd = heads * dim_head
    n_elems = N * C
    HN = heads * N
    GHN = G * HN
    # masks arrive as operands: building the [GHN, GHN] iota-compare mask
    # in-kernel cost ~33 us/step (recomputed every grid step); as operands
    # XLA folds them to constants and the constant-index blocks are fetched
    # to VMEM once per call.
    kv_mask = kvm_ref[...]  # [GHN, hd] f32 0/1
    s_mask = sm_ref[...]  # [G*N, GHN] f32
    group = grp_ref[...]  # [GHN, GHN] f32 0/1

    xf = x_ref[...].reshape(G * N, C).astype(jnp.float32)
    h_slabs = []
    for g in range(G):
        sl = xf[g * N : (g + 1) * N]
        mean = jnp.sum(sl) / n_elems
        mean2 = jnp.sum(sl * sl) / n_elems
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        h_slabs.append((sl - mean) * jax.lax.rsqrt(var + eps))
    h = (jnp.concatenate(h_slabs, axis=0) if G > 1 else h_slabs[0]).astype(o_ref.dtype)

    qkv = jax.lax.dot_general(
        h, wq_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0]  # [G*N, 3hd] f32

    q_all = qkv[:, :hd].astype(o_ref.dtype)  # [G*N, hd]
    k_stack = jnp.concatenate(
        [qkv[g * N : (g + 1) * N, hd : 2 * hd] for g in range(G) for _ in range(heads)],
        axis=0,
    ) if GHN > N else qkv[:, hd : 2 * hd]
    v_stack = jnp.concatenate(
        [
            qkv[g * N : (g + 1) * N, 2 * hd : 3 * hd]
            for g in range(G)
            for _ in range(heads)
        ],
        axis=0,
    ) if GHN > N else qkv[:, 2 * hd : 3 * hd]
    k_stack = (k_stack * kv_mask).astype(o_ref.dtype)  # [GHN, hd]
    v_stack = (v_stack * kv_mask).astype(o_ref.dtype)

    s = jax.lax.dot_general(
        q_all, k_stack, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [G*N, GHN]
    s = s * s_mask - 1e9 * (1.0 - s_mask)
    p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    den = jax.lax.dot_general(
        p, group, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # cross-sample blocks are 0/0 — real denominators are >= 1 (the row max
    # is attained inside the row), so the epsilon only de-NaNs the zeros.
    p = (p / (den + 1e-30)).astype(o_ref.dtype)
    att = jax.lax.dot_general(
        p, v_stack, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)  # [G*N, hd]

    y = jax.lax.dot_general(
        att, wo_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0]  # [G*N, C] f32
    for g in range(G):
        o_ref[g] = (y[g * N : (g + 1) * N] + xf[g * N : (g + 1) * N]).astype(
            o_ref.dtype
        )


def _pallas_attn_block_small(
    x, ng, nb, wqkv, wout, bout, heads, dim_head, scale, eps, interpret=False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, C = x.shape
    hd = heads * dim_head
    wq = ng.astype(jnp.float32)[:, None] * wqkv.astype(jnp.float32)
    bq = nb.astype(jnp.float32) @ wqkv.astype(jnp.float32)
    # The batched scores/denominator masks scale with (G*heads*N)^2 f32 —
    # cap the per-step sample block so GHN stays within one ~4 MB mask.
    block_g = max(min(B, 1024 // max(heads * N, 1)), 1)
    while B % block_g:
        block_g -= 1
    G = block_g
    HN = heads * N
    GHN = G * HN

    # constant masks, folded by XLA and fetched to VMEM once per call
    row_head = (jnp.arange(GHN)[:, None] % HN) // N
    col_head = jnp.arange(hd)[None, :] // dim_head
    kv_mask = (row_head == col_head).astype(jnp.float32)  # [GHN, hd]
    s_mask = (
        jnp.arange(G * N)[:, None] // N == jnp.arange(GHN)[None, :] // HN
    ).astype(jnp.float32)  # [G*N, GHN]
    dr = jnp.arange(GHN)[:, None]
    dc = jnp.arange(GHN)[None, :]
    group = ((dr // HN == dc // HN) & ((dr % HN) // N == (dc % HN) // N)).astype(
        jnp.float32
    )  # [GHN, GHN]

    kernel = functools.partial(
        _attn_block_small_kernel, heads=heads, dim_head=dim_head, scale=scale, eps=eps
    )
    row = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((block_g, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B // block_g,),
        in_specs=[
            blk, mat(C, 3 * hd), row(3 * hd), mat(hd, C), row(C),
            mat(GHN, hd), mat(G * N, GHN), mat(GHN, GHN),
        ],
        out_specs=blk,
        interpret=interpret,
    )(
        x, wq, bq.reshape(1, -1),
        wout.astype(jnp.float32), bout.astype(jnp.float32).reshape(1, -1),
        kv_mask, s_mask, group,
    )


def use_small_attn_block(shape, dtype, heads: int, dim_head: int) -> bool:
    """Dispatch for the fused bottleneck-attention block: small token counts
    where the XLA per-head einsums are pure layout overhead. Opt-out:
    DMN_TPU_PALLAS_ATTN_BLOCK=0."""
    import os

    if os.environ.get("DMN_TPU_PALLAS_ATTN_BLOCK") == "0":
        return False
    if dtype != jnp.bfloat16:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return os.environ.get("DMN_TPU_PALLAS_ATTN_BLOCK") == "interpret"
    B, N, C = shape
    hd = heads * dim_head
    return hd % 128 == 0 and N % 8 == 0 and 8 <= N <= 64 and heads * N <= 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_attention_block_small(
    x, norm_gamma, norm_beta, w_qkv, w_out, b_out,
    heads: int, dim_head: int, scale: float, eps: float = 1e-5,
):
    """Whole ``Residual(PreNorm(Attention))`` bottleneck block on [B, N, C].

    Pallas on TPU when `use_small_attn_block` holds (callers check it first);
    XLA module-equivalent composition otherwise. Reverse mode recomputes
    through the XLA path (custom_vjp — do not jvp)."""
    if use_small_attn_block(x.shape, x.dtype, heads, dim_head):
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _pallas_attn_block_small(
            x, norm_gamma, norm_beta, w_qkv, w_out, b_out,
            heads, dim_head, scale, eps, interpret=interpret,
        )
    return attention_block_reference(
        x, norm_gamma, norm_beta, w_qkv, w_out, b_out, heads, dim_head, scale, eps
    )


def _attn_small_fwd(x, ng, nb, wqkv, wout, bout, heads, dim_head, scale, eps):
    out = fused_attention_block_small(
        x, ng, nb, wqkv, wout, bout, heads, dim_head, scale, eps
    )
    return out, (x, ng, nb, wqkv, wout, bout)


def _attn_small_bwd(heads, dim_head, scale, eps, res, g):
    x, ng, nb, wqkv, wout, bout = res
    _, vjp = jax.vjp(
        lambda *a: attention_block_reference(*a, heads, dim_head, scale, eps),
        x, ng, nb, wqkv, wout, bout,
    )
    return vjp(g)


fused_attention_block_small.defvjp(_attn_small_fwd, _attn_small_bwd)
