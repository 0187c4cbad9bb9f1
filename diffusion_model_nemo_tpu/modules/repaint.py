"""RePaint inpainting — Lugmayr et al. 2022 (arXiv:2201.09865), Algorithm 1.

Beyond the reference's sampling surface (its GaussianDiffusion exposes only
the unconditional chain + q-space interpolation,
diffusion_model_nemo/modules/gaussian_diffusion.py:170-218): mask-conditioned
generation with ANY trained DDPM-family model, no retraining — at every
reverse step the known region is replaced by the forward-noised ground truth,

    x_{t-1} = m * q_sample(y, t-1)  +  (1 - m) * p_sample(x_t, t),

and "time-travel" resampling (after every ``jump_length`` reverse steps,
re-noise ``jump_length`` steps forward and redo them, ``jump_n_sample`` times
total) harmonizes the inpainted region with the known content.

TPU design, matching the other samplers in this package: the jump schedule is
precomputed on host into flat [N] vectors (per-op timestep + direction flag)
fed to one ``lax.scan``; the body selects reverse-denoise-and-blend vs
one-step forward re-noising with ``lax.cond`` (the network runs only in the
reverse branch — TPU conditionals execute the taken branch, so re-noising
steps cost only elementwise work). The carry is flat [B, H*W*C] like
``p_sample_loop``. NFE = number of reverse entries ≈ T * jump_n_sample.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion_process import ModelFn, _scan_unroll

__all__ = ["repaint_schedule", "repaint_loop"]


def repaint_schedule(
    timesteps: int, jump_length: int = 10, jump_n_sample: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side jump schedule (RePaint's ``get_schedule_jump``).

    Returns ``(t_op, is_reverse)`` — [N] int32 / bool. A reverse entry t
    means "denoise x_t -> x_{t-1} and blend the known region at t-1"; a
    forward entry s means "re-noise x_{s-1} -> x_s with beta_s".
    ``jump_n_sample=1`` (or ``jump_length=0``) degenerates to the plain
    reverse chain t = T-1 ... 0.
    """
    T = int(timesteps)
    j, r = int(jump_length), int(jump_n_sample)
    if j <= 0 or r <= 1:
        t_ops = list(range(T - 1, -1, -1))
        return (
            np.asarray(t_ops, np.int32),
            np.ones(len(t_ops), bool),
        )
    # remaining re-dos at each jump anchor (the anchors are every j levels,
    # excluding the top segment — RePaint reference implementation)
    jumps = {t: r - 1 for t in range(0, T - j, j)}
    t = T
    ops = []  # (t_op, is_reverse)
    while t >= 1:
        t -= 1
        ops.append((t, True))  # reverse at t: x_t -> x_{t-1}
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(j):
                t += 1
                ops.append((t, False))  # forward: x_{t-1} -> x_t with beta_t
    t_op = np.asarray([o[0] for o in ops], np.int32)
    is_rev = np.asarray([o[1] for o in ops], bool)
    return t_op, is_rev


def repaint_loop(
    process,
    model_fn: ModelFn,
    params: Any,
    known: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    jump_length: int = 10,
    jump_n_sample: int = 10,
    unnormalize: bool = True,
    img: Optional[jnp.ndarray] = None,
):
    """Inpaint ``known`` where ``mask == 0`` (mask 1 = keep pixel).

    Args:
        process: a GaussianDiffusion-family process (needs ``q_sample``,
            ``p_sample``, and the beta table in ``constants``).
        known: [B, H, W, C] ground truth in [-1, 1] data space.
        mask: broadcastable to ``known`` (e.g. [B, H, W, 1]); 1 = known
            pixel (kept), 0 = hole (generated). Soft values blend.
        unnormalize: map the output to [0, 1] like ``p_sample_loop``.
        img: optional starting latent (defaults to N(0, I)).

    Returns:
        [B, H, W, C]; the known region equals ``known`` exactly (the final
        blend at t=0 uses the clean image).
    """
    shape = tuple(known.shape)
    B = shape[0]
    c = process.constants
    t_op, is_rev = repaint_schedule(process.timesteps, jump_length, jump_n_sample)
    xs = {
        "t": jnp.asarray(t_op),
        "rev": jnp.asarray(is_rev),
    }

    key, init_key = jax.random.split(key)
    if img is None:
        img = jax.random.normal(init_key, shape, dtype=jnp.float32)

    y_flat = known.astype(jnp.float32).reshape(B, -1)
    m_flat = jnp.broadcast_to(mask.astype(jnp.float32), shape).reshape(B, -1)
    betas = jnp.asarray(c.betas, jnp.float32)

    def body(carry, xs_t):
        x, k = carry
        t = xs_t["t"]
        k, k_step, k_known = jax.random.split(k, 3)

        def reverse(x):
            # denoise x_t -> x_{t-1} (scalar t: table reads are dynamic-slices)
            x_prev = process.p_sample(model_fn, params, x, t, k_step, net_shape=shape)
            # known region at t-1: forward-noised ground truth; at t = 0 the
            # chain ends at the data level, so blend the clean image
            noise = jax.random.normal(k_known, x.shape, x.dtype)
            y_t = process.q_sample(y_flat, jnp.maximum(t - 1, 0), noise)
            y_t = jnp.where(t == 0, y_flat, y_t)
            return m_flat * y_t + (1.0 - m_flat) * x_prev

        def forward(x):
            # one-step re-noising x_{t-1} -> x_t (RePaint eq. 9)
            b = jax.lax.dynamic_index_in_dim(betas, t, keepdims=False)
            eps = jax.random.normal(k_step, x.shape, x.dtype)
            return jnp.sqrt(1.0 - b) * x + jnp.sqrt(b) * eps

        x = jax.lax.cond(xs_t["rev"], reverse, forward, x)
        return (x, k), None

    (flat, _), _ = jax.lax.scan(
        body, (img.reshape(B, -1), key), xs, unroll=_scan_unroll()
    )
    out = flat.reshape(shape)
    return (out + 1.0) * 0.5 if unnormalize else out
