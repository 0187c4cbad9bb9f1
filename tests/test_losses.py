"""Loss parity tests (simple, VLB incl. the fixed decoder_nll return, SDE)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_model_nemo_tpu.loss import (
    DiffusionLoss,
    SDEScoreFunctionLoss,
    VariationalBoundLoss,
)
from diffusion_model_nemo_tpu.modules.sde_lib import VESDE, VPSDE, subVPSDE


def test_simple_loss_types_and_reductions():
    a = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    b = jnp.zeros_like(a)
    assert np.isclose(float(DiffusionLoss("l2")(a, b)), float((a**2).mean()))
    assert np.isclose(float(DiffusionLoss("l1")(a, b)), float(jnp.abs(a).mean()))
    # huber: |x|<1 → 0.5x², else |x|-0.5
    h = DiffusionLoss("huber", reduction="none")(jnp.array([0.5, 2.0]), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(h), [0.125, 1.5])
    bm = DiffusionLoss("l2", reduction="batch_mean")(a, b)
    assert np.isclose(float(bm), float((a**2).reshape(2, -1).sum(-1).mean()))


def test_vlb_loss_t0_uses_decoder_nll():
    B = 4
    shape = (B, 2, 2, 1)
    key = jax.random.PRNGKey(0)
    samples = jax.random.uniform(key, shape, minval=-1, maxval=1)
    mean = samples * 0.9
    logvar = jnp.full(shape, -4.0)
    vbl = VariationalBoundLoss(weight=1.0, reduction="none")
    t0 = jnp.zeros((B,), jnp.int32)
    t5 = jnp.full((B,), 5, jnp.int32)
    vb0, nll0 = vbl(samples, mean, logvar, mean, logvar, t0)
    vb5, _ = vbl(samples, mean, logvar, mean, logvar, t5)
    # at t=0 the term is the decoder NLL; at t>0 with identical p/q the KL = 0
    np.testing.assert_allclose(np.asarray(vb0), np.asarray(nll0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vb5), 0.0, atol=1e-6)


def test_vlb_detach_model_mean_blocks_gradient():
    shape = (2, 2, 2, 1)
    samples = jnp.zeros(shape)
    true_mean = jnp.zeros(shape)
    logvar = jnp.zeros(shape)
    t = jnp.ones((2,), jnp.int32)

    def loss_of_mean(m, detach):
        vbl = VariationalBoundLoss(weight=1.0, detach_model_mean=detach, reduction="mean")
        vb, _ = vbl(samples, m, logvar, true_mean, logvar, t)
        return vb

    g_detached = jax.grad(lambda m: loss_of_mean(m, True))(jnp.ones(shape))
    g_attached = jax.grad(lambda m: loss_of_mean(m, False))(jnp.ones(shape))
    np.testing.assert_allclose(np.asarray(g_detached), 0.0, atol=1e-8)
    assert np.abs(np.asarray(g_attached)).sum() > 0


def test_sde_loss_perfect_score_is_small():
    """With the exact score of the marginal (for x0=0: score = -z/std), the
    unweighted loss ‖σ·score + z‖² vanishes."""
    sde = VPSDE(N=100)
    loss = SDEScoreFunctionLoss(continuous=True, likelihood_weighting=False)
    loss.update_sde(sde)
    B, shape = 4, (4, 4, 4, 1)
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, shape)
    x0 = jnp.zeros(shape)

    def perfect_model(params, x, labels):
        # model output is ε̂ (scaled by -1/std in the adapter); for x0=0,
        # x = std*z so ε̂ = x/std... the adapter gives score=-model/std.
        # True score = -z/std → model must output exactly z = x/std.
        t = labels / (sde.N - 1)
        _, std = sde.marginal_prob(jnp.zeros_like(x), t)
        return x / std.reshape(-1, 1, 1, 1)

    t = jnp.full((B,), 0.5)
    val = loss(perfect_model, None, x_start=x0, t=t, noise=noise)
    assert float(val) < 1e-8


def test_sde_loss_runs_all_sdes():
    for sde in (VPSDE(N=10), subVPSDE(N=10), VESDE(N=10)):
        for lw in (True, False):
            loss = SDEScoreFunctionLoss(likelihood_weighting=lw)
            loss.update_sde(sde)
            val = loss(
                lambda p, x, t: jnp.zeros_like(x),
                None,
                x_start=jnp.zeros((2, 4, 4, 1)),
                t=jnp.array([0.2, 0.8]),
                noise=jnp.ones((2, 4, 4, 1)),
            )
            assert np.isfinite(float(val))
