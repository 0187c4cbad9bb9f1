"""Class-conditional EDM (models/conditional_edm.py).

Correctness anchors:
  1. Construction: num_classes required; labels reach the network (spy) and
     training masks ~cond_drop_prob of them to the null class.
  2. CFG algebra: w = 1 guided sampling == plain conditional sampling (the
     guidance combination is affine in the raw network output), w != 1
     differs; guidance without a label is rejected; labels validated.
  3. Labels are jit ARGUMENTS, not closure captures: the same cached
     test/NLL graph must produce different results for different labels
     (the stale-closure regression this design exists to prevent).
  4. e2e: training decreases loss, archive round trip restores
     ConditionalEDM with identical guided samples, mesh-sharded guided
     sampling matches unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

IMG = 8
NCLS = 4


def _cfg(**over):
    cfg = {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 6,
        "compute_bpd": False,
        "num_classes": NCLS,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
            "num_classes": NCLS,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.EDMProcess",
            "sample_steps": 6,
            "solver": "heun",
            "sigma_min": 0.01,
            "sigma_max": 10.0,
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.EDMLoss",
            "sigma_data": 0.5,
            "reduction": "mean",
        },
    }
    cfg.update(over)
    return cfg


def _model(**over):
    from diffusion_model_nemo_tpu.models import ConditionalEDM

    m = ConditionalEDM(cfg=_cfg(**over))
    m.init_params(jax.random.PRNGKey(0))
    return m


def _batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "image": rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8),
            "label": rng.integers(0, NCLS, (batch_size,), dtype=np.int64),
        }


# ---- 1. construction + conditioning plumbing ---------------------------------------------
def test_num_classes_required():
    from diffusion_model_nemo_tpu.models import ConditionalEDM

    cfg = _cfg()
    cfg["num_classes"] = None
    with pytest.raises(ValueError, match="num_classes"):
        ConditionalEDM(cfg=cfg)


def test_training_masks_labels_to_null_class():
    m = _model()
    seen = {}

    def spy(params, x, t, classes=None, dropout_rng=None, aug_cond=None):
        seen["classes"] = classes
        return jnp.zeros_like(x)

    m.__dict__["model_fn"] = spy
    batch = {"label": jnp.arange(512) % NCLS, "pixel_values": jnp.zeros((512, IMG, IMG, 1))}
    fn = m.get_model_fn(batch, training=True, key=jax.random.PRNGKey(3))
    fn(None, jnp.zeros((512, IMG, IMG, 1)), jnp.zeros((512,)))
    cls = np.asarray(seen["classes"])
    frac_null = float(np.mean(cls == NCLS))
    assert 0.35 < frac_null < 0.65  # ~cond_drop_prob = 0.5
    # unmasked rows keep their original labels
    keep = cls != NCLS
    assert np.array_equal(cls[keep], np.asarray(batch["label"])[keep])

    # eval binding: no mask, labels pass through
    fn_eval = m.get_model_fn(batch, training=False)
    fn_eval(None, jnp.zeros((512, IMG, IMG, 1)), jnp.zeros((512,)))
    assert np.array_equal(np.asarray(seen["classes"]), np.asarray(batch["label"]))

    # unlabelled call runs as the null class
    del m.__dict__["model_fn"]
    out = m.forward(jnp.zeros((2, IMG, IMG, 1)), jnp.zeros((2,)))
    assert out.shape == (2, IMG, IMG, 1)


def test_cond_drop_prob_override():
    m = _model(cond_drop_prob=1.0)
    seen = {}

    def spy(params, x, t, classes=None, dropout_rng=None, aug_cond=None):
        seen["classes"] = classes
        return jnp.zeros_like(x)

    m.__dict__["model_fn"] = spy
    batch = {"label": jnp.zeros((64,), jnp.int32)}
    fn = m.get_model_fn(batch, training=True, key=jax.random.PRNGKey(0))
    fn(None, jnp.zeros((64, IMG, IMG, 1)), jnp.zeros((64,)))
    assert np.all(np.asarray(seen["classes"]) == NCLS)


# ---- 2. CFG algebra ------------------------------------------------------------------------
def test_guided_w1_equals_plain_conditional():
    m = _model()
    key = jax.random.PRNGKey(5)
    plain = m.sample(batch_size=2, image_size=IMG, key=key, label=1)
    guided = m.sample(batch_size=2, image_size=IMG, key=key, label=1, guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(plain), atol=1e-4)


def test_guided_w3_differs_and_is_reproducible():
    m = _model()
    key = jax.random.PRNGKey(6)
    a = m.sample(batch_size=2, image_size=IMG, key=key, label=2, guidance_scale=3.0)
    b = m.sample(batch_size=2, image_size=IMG, key=key, label=2, guidance_scale=3.0)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    uncond = m.sample(batch_size=2, image_size=IMG, key=key)
    assert not np.array_equal(np.asarray(a), np.asarray(uncond))
    assert np.isfinite(np.asarray(a)).all()


def test_guidance_validation():
    m = _model()
    with pytest.raises(ValueError, match="label"):
        m.sample(batch_size=1, image_size=IMG, guidance_scale=2.0)
    with pytest.raises(ValueError, match="label must be"):
        m.sample(batch_size=1, image_size=IMG, label=NCLS)


# ---- 3. labels are jit arguments, not closures ---------------------------------------------
def test_eval_and_nll_graphs_not_stale_across_labels():
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, IMG, IMG, 1)) * 0.5

    batch0 = {"image": np.full((4, IMG, IMG, 1), 128, np.uint8), "label": np.zeros(4, np.int64)}
    batch1 = {"image": np.full((4, IMG, IMG, 1), 128, np.uint8), "label": np.full(4, 3, np.int64)}
    # identical pixels, different labels, same key -> the SAME cached graph
    # must produce different losses (labels flow as arguments)
    l0 = m.test_step(batch0, 0, key=jax.random.PRNGKey(9))["edm_loss_sum"]
    l1 = m.test_step(batch1, 0, key=jax.random.PRNGKey(9))["edm_loss_sum"]
    assert float(jnp.abs(l0 - l1)) > 1e-7

    lab0 = jnp.zeros((4,), jnp.int32)
    lab3 = jnp.full((4,), 3, jnp.int32)
    bpd0, _, _ = m.likelihood(x, key=jax.random.PRNGKey(2), labels=lab0, num_steps=6)
    bpd3, _, _ = m.likelihood(x, key=jax.random.PRNGKey(2), labels=lab3, num_steps=6)
    assert np.isfinite(np.asarray(bpd0)).all() and np.isfinite(np.asarray(bpd3)).all()
    assert float(jnp.abs(bpd0 - bpd3).max()) > 1e-7

    # unlabelled NLL (null class) also works from the labels=None graph
    bpd_u, _, _ = m.likelihood(x, key=jax.random.PRNGKey(2), num_steps=6)
    assert np.isfinite(np.asarray(bpd_u)).all()


# ---- 4. e2e --------------------------------------------------------------------------------
def test_training_decreases_loss_archive_and_mesh():
    import optax

    from diffusion_model_nemo_tpu.models import ConditionalEDM, restore_model_from_archive

    m = _model()
    tx = optax.adam(1e-3)
    params, opt = m.params, tx.init(m.params)

    @jax.jit
    def step(params, opt, batch, key):
        (loss, _), g = jax.value_and_grad(m.training_step, has_aux=True)(
            params, batch, key, 0
        )
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    batches = _batches()
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        batch = next(batches)
        params, opt, loss = step(params, opt, jax.tree.map(jnp.asarray, batch), sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    m.params = params
    m.ema_params = jax.tree.map(jnp.copy, params)

    # archive round trip restores the conditional class + guided samples match
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        path = str(Path(d) / "cedm.dmn")
        m.save_to(path)
        restored = restore_model_from_archive(path)
        assert isinstance(restored, ConditionalEDM)
        key = jax.random.PRNGKey(7)
        a = m.sample(batch_size=2, image_size=IMG, key=key, label=1, guidance_scale=2.0)
        b = restored.sample(batch_size=2, image_size=IMG, key=key, label=1, guidance_scale=2.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mesh_sharded_guided_sampling_matches():
    from diffusion_model_nemo_tpu.parallel.mesh import make_mesh

    m = _model()
    mesh = make_mesh()
    key = jax.random.PRNGKey(11)
    plain = m.sample(batch_size=8, image_size=IMG, key=key, label=2, guidance_scale=2.0)
    sharded = m.sample(
        batch_size=8, image_size=IMG, key=key, label=2, guidance_scale=2.0, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=2e-5)
