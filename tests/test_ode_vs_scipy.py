"""In-graph RK45 vs scipy solve_ivp on nontrivial ODEs.

The reference uses scipy RK45 for probability-flow sampling/likelihood; our
integrator must agree on the same problems within tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import integrate

from diffusion_model_nemo_tpu.ops.ode import odeint_rk45


def run_both(f_np, f_jax, y0, t0, t1, rtol=1e-5, atol=1e-5):
    sol_sp = integrate.solve_ivp(f_np, (t0, t1), y0, rtol=rtol, atol=atol, method="RK45")
    sol_us = odeint_rk45(f_jax, jnp.asarray(y0), t0, t1, rtol=rtol, atol=atol)
    return sol_sp.y[:, -1], np.asarray(sol_us.y), sol_sp.nfev, int(sol_us.nfev)


def test_linear_system():
    A = np.array([[0.0, 1.0], [-4.0, -0.3]])
    f_np = lambda t, y: A @ y
    f_jax = lambda t, y: jnp.asarray(A) @ y
    y_sp, y_us, nfev_sp, nfev_us = run_both(f_np, f_jax, np.array([1.0, 0.0]), 0.0, 5.0)
    np.testing.assert_allclose(y_us, y_sp, rtol=1e-3, atol=1e-4)
    assert 0.2 < nfev_us / nfev_sp < 5.0  # comparable work


def test_stiffish_vpsde_like_drift():
    """Drift shaped like the VP probability-flow ODE: -0.5 beta(t) y with
    beta ramping 0.1 -> 20 (what the likelihood integrates)."""

    def beta(t):
        return 0.1 + t * (20.0 - 0.1)

    f_np = lambda t, y: -0.5 * beta(t) * y
    f_jax = lambda t, y: -0.5 * beta(t) * y
    y_sp, y_us, *_ = run_both(f_np, f_jax, np.array([1.0, -2.0, 0.5]), 1e-5, 1.0)
    np.testing.assert_allclose(y_us, y_sp, rtol=1e-3, atol=1e-5)


def test_nonlinear_vdp():
    mu = 1.0

    def f_np(t, y):
        return np.array([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    def f_jax(t, y):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    y_sp, y_us, *_ = run_both(f_np, f_jax, np.array([2.0, 0.0]), 0.0, 6.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(y_us, y_sp, rtol=5e-3, atol=1e-4)


def test_reverse_time_integration():
    f_np = lambda t, y: -y * np.cos(t)
    f_jax = lambda t, y: -y * jnp.cos(t)
    y_sp, y_us, *_ = run_both(f_np, f_jax, np.array([1.5]), 2.0, 0.0)
    np.testing.assert_allclose(y_us, y_sp, rtol=1e-3)


def test_max_steps_flag():
    sol = odeint_rk45(lambda t, y: -y, jnp.ones(2), 0.0, 1.0, max_steps=3)
    assert not bool(sol.success)
