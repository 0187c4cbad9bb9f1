"""Training-loss-trajectory parity vs a torch replica of the reference.

The reference's DDPM hot loop (models/ddpm.py:43-77) is: t ~ U[0,T),
q_sample with the linear-schedule constant table
(gaussian_diffusion.py:44-116), U-Net predicts the noise, MSE loss, AdamW
step. This test runs that exact loop twice — once in torch (the TUnet
replica + torch.optim.AdamW) and once through this framework's math (same
transplanted weights, optax.adamw) — feeding both the SAME (x0, t, noise)
sequence, and asserts the per-step loss curves and final parameters match.
This is the strongest loss-curve parity evidence available without real
datasets/network: same inputs → same losses → same updates, step for step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from diffusion_model_nemo_tpu.ops.schedules import linear_beta_schedule

from tests.test_torch_parity_unet import (
    TUnet,
    cw,
    cb,
    lin,
    gn,
    resnet_params,
    lin_attn_params,
    attn_params,
)
from diffusion_model_nemo_tpu.modules import Unet

T = 50
LR = 1e-3
BETAS = (0.9, 0.999)
STEPS = 8
B = 4


def transplant(tnet):
    return {
        "init_conv": {"kernel": cw(tnet.init_conv), "bias": cb(tnet.init_conv)},
        "time_dense0": lin(tnet.time_l0),
        "time_dense1": lin(tnet.time_l1),
        "down_0_block1": resnet_params(tnet.d0_b1, has_res_conv=False),
        "down_0_block2": resnet_params(tnet.d0_b2, has_res_conv=False),
        "down_0_attn": lin_attn_params(tnet.d0_attn),
        "down_0_downsample": {"conv": {"kernel": cw(tnet.d0_down), "bias": cb(tnet.d0_down)}},
        "down_1_block1": resnet_params(tnet.d1_b1, has_res_conv=True),
        "down_1_block2": resnet_params(tnet.d1_b2, has_res_conv=False),
        "down_1_attn": lin_attn_params(tnet.d1_attn),
        "mid_block1": resnet_params(tnet.mid_b1, has_res_conv=False),
        "mid_attn": attn_params(tnet.mid_attn),
        "mid_block2": resnet_params(tnet.mid_b2, has_res_conv=False),
        "up_0_block1": resnet_params(tnet.u0_b1, has_res_conv=True),
        "up_0_block2": resnet_params(tnet.u0_b2, has_res_conv=False),
        "up_0_attn": lin_attn_params(tnet.u0_attn),
        "up_0_upsample": {
            "conv": {
                "kernel": jnp.asarray(
                    np.ascontiguousarray(
                        tnet.u0_up.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
                    )
                ),
                "bias": cb(tnet.u0_up),
            }
        },
        "final_block": {
            "block1": {
                "proj": {
                    "kernel": cw(tnet.final_block.block1.proj),
                    "bias": cb(tnet.final_block.block1.proj),
                },
                "norm": gn(tnet.final_block.block1.norm),
            },
            "block2": {
                "proj": {
                    "kernel": cw(tnet.final_block.block2.proj),
                    "bias": cb(tnet.final_block.block2.proj),
                },
                "norm": gn(tnet.final_block.block2.norm),
            },
        },
        "final_norm": gn(tnet.final_norm),
        "final_conv": {"kernel": cw(tnet.final_conv), "bias": cb(tnet.final_conv)},
    }


def run_parity(steps: int = STEPS):
    """Run the torch-replica and framework training loops on identical
    inputs; returns the per-step loss curves and max deltas. Shared by the
    parity test below and bench.py's driver-visible ``parity`` leg
    (tools/parity_probe.py)."""
    torch.manual_seed(0)
    tnet = TUnet(dim=8, channels=1, groups=4)
    fnet = Unet(dim=8, channels=1, dim_mults=[1, 2], use_convnext=False, resnet_block_groups=4)
    # Deep-copy: torch .detach().numpy() VIEWS the torch storage and the CPU
    # jax backend adopts numpy buffers zero-copy, so without the copy
    # torch's in-place optimizer steps would silently mutate these params.
    params = jax.tree.map(lambda a: jnp.array(np.asarray(a), copy=True), transplant(tnet))

    # Same constant table on both sides (float64 host construction like
    # gaussian_diffusion.py:44-83, truncated to float32 for compute).
    betas = np.asarray(linear_beta_schedule(T), np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    sqrt_ac = np.sqrt(alphas_cumprod).astype(np.float32)
    sqrt_1mac = np.sqrt(1.0 - alphas_cumprod).astype(np.float32)

    # Pre-drawn shared batches: the reference draws torch RNG, we draw
    # jax.random — parity needs identical inputs, so both consume these.
    rng = np.random.RandomState(42)
    x0s = rng.randn(steps, B, 8, 8, 1).astype(np.float32)
    noises = rng.randn(steps, B, 8, 8, 1).astype(np.float32)
    ts = rng.randint(0, T, size=(steps, B)).astype(np.int64)

    # ---- torch side: reference training_step math (models/ddpm.py:43-77) ----
    opt = torch.optim.AdamW(tnet.parameters(), lr=LR, betas=BETAS, weight_decay=0.0)
    t_losses = []
    for i in range(steps):
        x0 = torch.from_numpy(x0s[i]).permute(0, 3, 1, 2)
        noise = torch.from_numpy(noises[i]).permute(0, 3, 1, 2)
        t = torch.from_numpy(ts[i])
        coef1 = torch.from_numpy(sqrt_ac)[t].view(B, 1, 1, 1)
        coef2 = torch.from_numpy(sqrt_1mac)[t].view(B, 1, 1, 1)
        x_t = coef1 * x0 + coef2 * noise
        pred = tnet(x_t, t.float())
        loss = torch.nn.functional.mse_loss(pred, noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---- our side: same math through the framework's modules ----
    tx = optax.adamw(LR, b1=BETAS[0], b2=BETAS[1], weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x0, noise, t):
        def loss_fn(p):
            coef1 = jnp.asarray(sqrt_ac)[t][:, None, None, None]
            coef2 = jnp.asarray(sqrt_1mac)[t][:, None, None, None]
            x_t = coef1 * x0 + coef2 * noise
            pred = fnet.apply({"params": p}, x_t, t.astype(jnp.float32))
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    f_losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x0s[i]), jnp.asarray(noises[i]), jnp.asarray(ts[i])
        )
        f_losses.append(float(loss))

    final_torch = transplant(tnet)
    max_param_delta = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(final_torch))
    )
    return {
        "t_losses": t_losses,
        "f_losses": f_losses,
        "max_loss_delta": float(np.max(np.abs(np.asarray(f_losses) - np.asarray(t_losses)))),
        "max_param_delta": max_param_delta,
        "final_params": params,
        "final_torch": final_torch,
    }


def test_training_loss_trajectory_matches_torch_reference():
    res = run_parity()

    # Loss curves match step for step (float32 accumulation differences only;
    # measured ~1e-6 relative over the 8 AdamW steps).
    np.testing.assert_allclose(res["f_losses"], res["t_losses"], rtol=1e-4, atol=1e-6)

    # And the optimized parameters stay in lockstep after STEPS updates.
    # Adam divides by sqrt(v_hat): where v is near zero, float noise in the
    # grads is amplified into the update, so params get a slightly looser
    # bound than the losses (measured worst case 2e-4 on one element).
    for a, b in zip(
        jax.tree.leaves(res["final_params"]), jax.tree.leaves(res["final_torch"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)
