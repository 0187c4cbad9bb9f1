"""Post-hoc EMA: power-function parameter averaging with after-the-fact
profile selection (Karras et al. 2024, "Analyzing and Improving the Training
Dynamics of Diffusion Models", §3 / App. B).

The classic EMA decay (training/ema.py — the reference has no EMA at all;
SURVEY §7.4 adds it as a framework service) must be chosen BEFORE training,
and the right value is only knowable after. Power-function EMA fixes that:

* During training, maintain a small number (default two) of *power-function*
  averages. The average with exponent ``gamma`` weights the parameter history
  by the scale-free profile ``p_gamma_t(s) ∝ s^gamma`` for ``s ∈ [0, t]``
  (t = completed optimizer steps), realized online by

      beta(t) = (1 - 1/t)^(gamma + 1)
      ema    <- beta * ema + (1 - beta) * params        (t = 1, 2, ...)

  At t=1 beta is exactly 0, so the state starts as a copy of the params.
* Snapshot every average to disk at a fixed cadence (cheap: a host copy +
  msgpack, a handful of files per run).
* After training, the EMA for ANY target profile ``(gamma_r, t_r)`` — or the
  paper's more intuitive relative-width parameterization ``sigma_rel`` — is
  reconstructed as the least-squares combination of the stored snapshots.
  The Gram matrix of profile inner products has a closed form (below), so
  reconstruction is a tiny host-side linear solve plus one weighted sum over
  the snapshot pytrees.

TPU design: the online update is one fused multiply-add per tracked gamma,
jitted with donated state buffers (same recipe as the classic EMA inside the
train step); beta is computed as ``exp((gamma+1) * log1p(-1/t))`` so it stays
accurate in float32 at large t. Reconstruction is pure host numpy in float64.

Wiring: ``Trainer(posthoc_ema_sigma_rels=[0.05, 0.10],
posthoc_ema_every_n_steps=1024)`` maintains + snapshots the averages and
carries them through checkpoints (bitwise resume);
``tools/reconstruct_ema.py`` turns a snapshot directory + base archive into
a ``.dmn`` with the reconstructed EMA.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sigma_rel_to_gamma",
    "gamma_to_sigma_rel",
    "power_ema_beta",
    "power_ema_update",
    "profile_dot",
    "solve_posthoc_weights",
    "PostHocEMA",
    "list_snapshots",
    "reconstruct",
]


# --------------------------------------------------------------- profiles ----
def gamma_to_sigma_rel(gamma: float) -> float:
    """Relative standard deviation of the ``s^gamma`` profile:
    sigma_rel^2 = (gamma+1) / ((gamma+2)^2 (gamma+3))."""
    g = float(gamma)
    return float(np.sqrt((g + 1.0) / ((g + 2.0) ** 2 * (g + 3.0))))


def sigma_rel_to_gamma(sigma_rel: float) -> float:
    """Invert ``gamma_to_sigma_rel``. Expanding
    (gamma+2)^2 (gamma+3) = t (gamma+1) with t = sigma_rel^-2 gives the cubic
    gamma^3 + 7 gamma^2 + (16 - t) gamma + (12 - t) = 0; the physical root is
    the largest real one (the other two are < -1)."""
    s = float(sigma_rel)
    if not 0.0 < s < gamma_to_sigma_rel(0.0):
        raise ValueError(
            f"sigma_rel must be in (0, {gamma_to_sigma_rel(0.0):.4f}) "
            f"(gamma=0 is the flat/uniform profile); got {s}"
        )
    t = s ** -2
    roots = np.roots([1.0, 7.0, 16.0 - t, 12.0 - t])
    return float(np.max(roots.real))


def power_ema_beta(gamma: float, t: jnp.ndarray) -> jnp.ndarray:
    """beta(t) = (1 - 1/t)^(gamma+1), computed in log space so float32 stays
    accurate at large t (1 - 1/t quantizes at t ~ 1e7 in f32; log1p(-1/t)
    does not)."""
    t = jnp.maximum(t.astype(jnp.float32), 1.0)
    return jnp.exp((gamma + 1.0) * jnp.log1p(-1.0 / t))


def power_ema_update(ema: Any, params: Any, gamma: float, t: jnp.ndarray) -> Any:
    """One online power-EMA step at profile time ``t`` (= completed optimizer
    steps, 1-based). Pure; safe inside jit."""
    beta = power_ema_beta(gamma, t)
    return jax.tree.map(
        lambda e, p: e * beta + p.astype(e.dtype) * (1.0 - beta), ema, params
    )


def profile_dot(
    t_a: np.ndarray, gamma_a: np.ndarray, t_b: np.ndarray, gamma_b: np.ndarray
) -> np.ndarray:
    """Closed-form inner product of two normalized power profiles
    p_{gamma,t}(s) = (gamma+1) s^gamma / t^(gamma+1) on s ∈ [0, min(ta, tb)]:

        <p_a, p_b> = (ga+1)(gb+1) min(ta,tb)^(ga+gb+1)
                     / ((ga+gb+1) ta^(ga+1) tb^(gb+1))

    Evaluated in log space (t^~(gamma sums) overflows float64 for long runs).
    Broadcasts; float64."""
    ta = np.asarray(t_a, np.float64)
    tb = np.asarray(t_b, np.float64)
    ga = np.asarray(gamma_a, np.float64)
    gb = np.asarray(gamma_b, np.float64)
    log_val = (
        (ga + gb + 1.0) * np.log(np.minimum(ta, tb))
        - (ga + 1.0) * np.log(ta)
        - (gb + 1.0) * np.log(tb)
    )
    return (ga + 1.0) * (gb + 1.0) / (ga + gb + 1.0) * np.exp(log_val)


def solve_posthoc_weights(
    ts: Sequence[float],
    gammas: Sequence[float],
    t_target: float,
    gamma_target: float,
) -> np.ndarray:
    """Least-squares weights x minimizing || sum_i x_i p_i - p_target || in
    profile space: solve A x = b with A_ij = <p_i, p_j>, b_i = <p_i, p_r>."""
    ts = np.asarray(ts, np.float64)
    gs = np.asarray(gammas, np.float64)
    A = profile_dot(ts[:, None], gs[:, None], ts[None, :], gs[None, :])
    b = profile_dot(ts, gs, np.float64(t_target), np.float64(gamma_target))
    try:
        return np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        # Near-duplicate snapshots make the Gram singular; fall back to the
        # minimum-norm solution.
        return np.linalg.lstsq(A, b, rcond=None)[0]


# --------------------------------------------------------------- training ----
class PostHocEMA:
    """Maintains the tracked power-EMA averages during training and writes
    snapshots. One instance per run; the state is a list of param-shaped
    pytrees (one per tracked sigma_rel), donated by the jitted update."""

    def __init__(
        self,
        directory: str,
        sigma_rels: Sequence[float] = (0.05, 0.10),
        every_n_steps: int = 1024,
    ):
        if not sigma_rels:
            raise ValueError("sigma_rels must be non-empty")
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.sigma_rels = tuple(float(s) for s in sigma_rels)
        self.gammas = tuple(sigma_rel_to_gamma(s) for s in self.sigma_rels)
        self.every = int(every_n_steps)
        self._update_jit = None

    # ---- state ----
    def init_state(self, params: Any) -> List[Any]:
        # Real copies: the state is donated by the update (CLAUDE.md aliasing
        # invariant), and the very first update overwrites it anyway (beta=0
        # at t=1).
        return [jax.tree.map(jnp.copy, params) for _ in self.gammas]

    def update(self, state: List[Any], params: Any, t: jnp.ndarray) -> List[Any]:
        """Pure: advance every tracked average to profile time ``t``
        (= completed optimizer steps, i.e. the post-increment step counter)."""
        return [
            power_ema_update(tree, params, g, t) for tree, g in zip(state, self.gammas)
        ]

    def jitted_update(self):
        if self._update_jit is None:
            self._update_jit = jax.jit(self.update, donate_argnums=(0,))
        return self._update_jit

    # ---- snapshots ----
    def snapshot(self, state: List[Any], t: int) -> List[Path]:
        from flax import serialization

        from .checkpoints import to_dict_arrays

        paths = []
        host = jax.device_get(state)
        for gamma, tree in zip(self.gammas, host):
            p = self.dir / f"phema-{gamma:.6f}-{int(t):010d}.msgpack"
            p.write_bytes(serialization.msgpack_serialize(to_dict_arrays(tree)))
            paths.append(p)
        return paths

    def maybe_snapshot(self, state: List[Any], t: int) -> None:
        if self.every > 0 and t > 0 and t % self.every == 0:
            self.snapshot(state, t)


# ---------------------------------------------------------- reconstruction ----
def list_snapshots(directory: str) -> List[Tuple[float, int, Path]]:
    """Enumerate snapshot files → sorted [(gamma, t, path)]."""
    out = []
    for p in Path(directory).glob("phema-*-*.msgpack"):
        try:
            _, gamma_s, t_s = p.stem.split("-")
            out.append((float(gamma_s), int(t_s), p))
        except ValueError:
            continue
    return sorted(out, key=lambda x: (x[1], x[0]))


def reconstruct(
    directory: str,
    sigma_rel: Optional[float] = None,
    gamma: Optional[float] = None,
    t: Optional[int] = None,
) -> Any:
    """Reconstruct the EMA for an arbitrary target profile from a snapshot
    directory. Exactly one of ``sigma_rel`` / ``gamma`` selects the profile;
    ``t`` defaults to the latest snapshot time. Returns a float32 numpy
    pytree (accumulated in float64)."""
    if (sigma_rel is None) == (gamma is None):
        raise ValueError("pass exactly one of sigma_rel / gamma")
    gamma_r = sigma_rel_to_gamma(sigma_rel) if gamma is None else float(gamma)

    snaps = list_snapshots(directory)
    if not snaps:
        raise FileNotFoundError(f"no phema-*.msgpack snapshots in {directory}")
    t_r = float(t if t is not None else max(s[1] for s in snaps))

    weights = solve_posthoc_weights(
        [s[1] for s in snaps], [s[0] for s in snaps], t_r, gamma_r
    )

    from flax import serialization

    acc = None
    for (g, ti, path), w in zip(snaps, weights):
        tree = serialization.msgpack_restore(path.read_bytes())
        scaled = jax.tree.map(lambda x: np.asarray(x, np.float64) * w, tree)
        acc = scaled if acc is None else jax.tree.map(np.add, acc, scaled)
    return jax.tree.map(lambda x: np.asarray(x, np.float32), acc)
