"""Profile the full training step (loss+grads+AdamW+EMA) on the TPU.

Same trace-parsing recipe as profile_sampler.py, applied to the donated
production update. Used to chase the round-3 observation that the s2d
geometry trains SLOWER than parity despite sampling 3x faster.

Usage: DMN_PROFILE_GEOMETRY=off|s2d python tools/profile_train.py [dim] [batch]
"""

import os
import sys
import tempfile
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from profile_sampler import parse_trace  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    STEPS = 10

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship
    from diffusion_model_nemo_tpu.training.ema import ema_update
    from diffusion_model_nemo_tpu.training.optim import build_optimizer

    geom = os.environ.get("DMN_PROFILE_GEOMETRY", "off")
    model = _flagship(image_size=32, dim=dim, dim_mults=(1, 2, 2, 2), timesteps=1000,
                      tpu_geometry=geom)
    model.init_params(jax.random.PRNGKey(0))

    tx, _ = build_optimizer(model.cfg.get("optim"), max_steps=1000, grad_clip=1.0)
    params = jax.tree.map(jnp.copy, model.params)
    ema = jax.tree.map(jnp.copy, model.ema_params)
    opt = tx.init(params)
    batch_data = jax.device_put(
        {"image": np.random.randint(0, 255, (batch, 32, 32, 3), dtype=np.uint8),
         "label": np.zeros((batch,), np.int32)}
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def update(params, opt_state, ema_params, b, key, step):
        (loss, _), g = jax.value_and_grad(model.training_step, has_aux=True)(
            params, b, key, step)
        u, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, u)
        ema_params = ema_update(ema_params, params, 0.9999, step)
        return params, opt_state, ema_params, {"train_loss": loss,
                                               "grad_norm": optax.global_norm(g)}

    key = jax.random.PRNGKey(1)
    for i in range(3):
        params, opt, ema, m = update(params, opt, ema, batch_data,
                                     jax.random.fold_in(key, i), jnp.asarray(i))
    m["train_loss"].block_until_ready()

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        for i in range(STEPS):
            params, opt, ema, m = update(params, opt, ema, batch_data,
                                         jax.random.fold_in(key, 100 + i), jnp.asarray(i))
        m["train_loss"].block_until_ready()
        jax.profiler.stop_trace()
        total, by_cat, by_name = parse_trace(Path(d))

    print(f"\n== geometry={geom} dim={dim} B={batch}: device total {total:.1f} ms "
          f"({total / STEPS:.3f} ms/step, {batch / (total / STEPS / 1e3):.1f} sps-device) ==")
    print("\n-- by category (ms total, ms/step) --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{k:20s} {v:10.1f} {v / STEPS:8.4f}")
    print("\n-- top 40 ops --")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:10.2f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
