"""Adaptive Dormand–Prince RK45 integrator in pure JAX.

Replaces the reference's host-bound ``scipy.integrate.solve_ivp`` usage
(probability_flow_sampler.py:79-93, sde_lib/likelihood.py:68-90) — those
marshal numpy↔torch on every solver stage, a device↔host sync per function
evaluation. Here the whole solve runs inside one ``lax.while_loop`` under
jit: state stays in HBM, and the NFE count survives jit as part of the carry.

The method is the same RK45(Dormand–Prince) pair scipy's ``RK45`` uses, with
standard PI-free step-size control; tolerances default to the reference's
rtol=atol=1e-5.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["odeint_rk45", "ODESolution", "poison_on_failure"]

# Dormand–Prince 5(4) Butcher tableau (same as scipy RK45).
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_ERR = _B5 - _B4

SAFETY = 0.9
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
ORDER = 5.0


class ODESolution(NamedTuple):
    y: Any  # final state (pytree)
    nfev: jnp.ndarray  # int32 number of function evaluations
    success: jnp.ndarray  # bool (max_steps not exhausted)


def _tree_axpy(ys, coeffs):
    """Weighted sum of a list of pytrees."""
    out = jax.tree.map(lambda *ks: sum(c * k for c, k in zip(coeffs, ks)), *ys)
    return out


def _error_norm(err, y0, y1, rtol, atol):
    e_leaves = jax.tree.leaves(err)
    a_leaves = jax.tree.leaves(y0)
    b_leaves = jax.tree.leaves(y1)
    total = 0.0
    n = 0
    for e, a, b in zip(e_leaves, a_leaves, b_leaves):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = (e / scale).astype(jnp.float32)
        total = total + jnp.sum(r * r)
        n += int(e.size)
    return jnp.sqrt(total / n)


def odeint_rk45(
    func: Callable[[jnp.ndarray, Any], Any],
    y0: Any,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 10_000,
    first_step: float = 1e-3,
) -> ODESolution:
    """Integrate ``dy/dt = func(t, y)`` from ``t0`` to ``t1`` (either
    direction); ``y`` is an arbitrary pytree.

    Returns the final state plus the function-evaluation count (the
    reference reports this as sampling NFE, probability_flow_sampler.py:95 —
    fixing its ``solution.nfe`` typo for scipy's ``nfev``).
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    direction = jnp.sign(t1 - t0)
    h0 = direction * jnp.abs(jnp.asarray(first_step, jnp.float32))

    def rk_step(t, y, h):
        ks = [func(t, y)]
        for i in range(1, 7):
            coeffs = _A[i]
            y_i = jax.tree.map(
                lambda y_, *k_: y_ + h * sum(c * kk for c, kk in zip(coeffs, k_)),
                y,
                *ks,
            )
            ks.append(func(t + _C[i] * h, y_i))
        y1 = jax.tree.map(
            lambda y_, *k_: y_ + h * sum(b * kk for b, kk in zip(list(_B5), k_)), y, *ks
        )
        err = jax.tree.map(
            lambda *k_: h * sum(e * kk for e, kk in zip(list(_ERR), k_)), *ks
        )
        return y1, err

    def cond(state):
        t, y, h, nfe, step, done = state
        return jnp.logical_and(jnp.logical_not(done), step < max_steps)

    def body(state):
        t, y, h, nfe, step, done = state
        # Clip step to not overshoot t1.
        h = jnp.where(direction * (t + h - t1) > 0, t1 - t, h)
        y1, err = rk_step(t, y, h)
        enorm = _error_norm(err, y, y1, rtol, atol)
        accept = enorm <= 1.0

        factor = jnp.where(
            enorm == 0.0,
            MAX_FACTOR,
            jnp.clip(SAFETY * enorm ** (-1.0 / ORDER), MIN_FACTOR, MAX_FACTOR),
        )
        h_next = h * factor

        t_new = jnp.where(accept, t + h, t)
        y_new = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y1)
        reached = direction * (t_new - t1) >= 0
        return (t_new, y_new, h_next, nfe + 7, step + 1, reached)

    init = (t0, y0, h0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    t, y, h, nfe, step, done = jax.lax.while_loop(cond, body, init)
    return ODESolution(y=y, nfev=nfe, success=done)


def poison_on_failure(sol: ODESolution, tree: Any, what: str) -> Any:
    """NaN-poison ``tree`` when the solver exhausted ``max_steps``.

    Hitting ``max_steps`` means the last iterate is NOT a converged solution;
    returning it as-is would silently corrupt samples / bits-per-dim. A traced
    predicate cannot raise under jit, so instead the result is made impossible
    to mistake for success: float leaves become NaN (the Trainer's non-finite
    halt and any downstream consumer will trip on them) and a device-side
    warning is printed.
    """
    def _warn(_):
        jax.debug.print(
            "WARNING: RK45 exhausted max_steps before reaching t1 during "
            + what
            + "; results are NaN-poisoned (raise max_steps or loosen rtol/atol)"
        )

    jax.lax.cond(sol.success, lambda _: None, _warn, None)
    return jax.tree.map(
        lambda a: jnp.where(sol.success, a, jnp.nan).astype(a.dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.inexact)
        else a,
        tree,
    )
