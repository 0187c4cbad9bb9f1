"""Equal-data training comparison: parity U-Net vs tpu_geometry=s2d.

Both models train on the SAME synthetic batches, same process constants,
same uniform-t draws, same ε targets — the loss is ε-prediction MSE on an
identical task, so the trajectories are directly comparable across the two
architectures. This is the capacity-parity evidence for the opt-in geometry
path (it alters the architecture, so weight-level numerics parity is not
defined).

Usage: python tools/compare_s2d_training.py [steps] [batch] [geom,geom,...]
Prints one JSON line with both loss trajectories (logged every 10 steps).
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def train_one(geom: str, steps: int, batch: int, data: np.ndarray):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship
    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    model = _flagship(image_size=32, dim=32, dim_mults=(1, 2, 2, 2),
                      timesteps=1000, tpu_geometry=geom)
    model.init_params(jax.random.PRNGKey(0))
    tx, _ = build_optimizer(model.cfg.get("optim"), max_steps=steps, grad_clip=1.0)
    params = jax.tree.map(jnp.copy, model.params)
    ema = jax.tree.map(jnp.copy, model.ema_params)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def update(params, opt_state, ema_params, batch, key, step):
        (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
            params, batch, key, step
        )
        u, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, u)
        ema_params = ema_update(ema_params, params, 0.9999, step)
        return params, opt_state, ema_params, loss

    # One fixed dataset of batches, identical for both models; the training
    # key stream (t draws + noise) is identical too — only the network
    # architecture differs.
    losses = []
    key = jax.random.PRNGKey(42)
    n_batches = data.shape[0]
    t0 = time.perf_counter()
    for i in range(steps):
        b = {"image": data[i % n_batches], "label": np.zeros((batch,), np.int32)}
        params, opt, ema, loss = update(
            params, opt, ema, b, jax.random.fold_in(key, i), jnp.asarray(i)
        )
        if i % 10 == 0 or i == steps - 1:
            losses.append((i, round(float(loss), 5)))
    wall = time.perf_counter() - t0
    return losses, wall


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    rng = np.random.RandomState(0)
    # 8 fixed uint8 batches, reused cyclically — identical data stream.
    data = rng.randint(0, 255, (8, batch, 32, 32, 3), dtype=np.uint8)

    geoms = sys.argv[3].split(",") if len(sys.argv) > 3 else ["off", "s2d"]
    out = {}
    for geom in geoms:
        losses, wall = train_one(geom, steps, batch, data)
        out[geom] = {
            "final_loss": losses[-1][1],
            "last5_mean": round(float(np.mean([l for _, l in losses[-5:]])), 5),
            "wall_s": round(wall, 2),
            "sps": round(steps * batch / wall, 1),
            "trajectory": losses,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
