"""LoRA fine-tuning (training/lora.py) — Hu et al. 2021.

Correctness anchors:
  1. Merge math: for hand-set A, B the merged kernel is exactly
     W + (α/r)·reshape(A@B) (conv 4-d AND dense 2-d kernels), and at init
     (B = 0) the merge is BITWISE the base tree.
  2. Targeting: the regex selects exactly the matching kernels; rank is
     clamped to min(fan_in, cout); bad regex/rank fail loudly.
  3. Fine-tuning: loss decreases, the BASE params are bitwise untouched,
     the adapter fraction is small, and a merged model samples finite
     images that differ from the base's under the same key.
  4. Adapter persistence: save → load → merge reproduces the fine-tuned
     model's samples bitwise on a freshly restored base archive.
  5. Mesh equivalence: one SGD LoRA step on the 8-way data mesh matches
     the single-device step (SGD because Adam + global-norm clip are
     gradient-scale-invariant — a psum-vs-pmean bug would be invisible).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

IMG = 8


def _cfg():
    return {
        "image_size": IMG,
        "channels": 1,
        "timesteps": 10,
        "compute_bpd": False,
        "diffusion_model": {
            "_target_": "diffusion_model_nemo.modules.Unet",
            "dim": 8,
            "dim_mults": [1, 2],
            "channels": 1,
            "resnet_block_groups": 4,
        },
        "sampler": {
            "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
            "timesteps": 10,
            "schedule_name": "linear",
        },
        "loss": {
            "_target_": "diffusion_model_nemo.loss.DiffusionLoss",
            "loss_type": "l2",
            "reduction": "mean",
        },
    }


def _model(seed=0):
    from diffusion_model_nemo_tpu.models import DDPM

    m = DDPM(cfg=_cfg())
    m.init_params(jax.random.PRNGKey(seed))
    return m


def _batches(batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    fixed = rng.integers(0, 255, (batch_size, IMG, IMG, 1), dtype=np.uint8)
    while True:
        yield {"image": fixed}


# ---- 1. merge math --------------------------------------------------------------------
def test_merge_math_and_zero_init_identity():
    from diffusion_model_nemo_tpu.training import lora_init, merge_adapters

    m = _model()
    adapters = lora_init(m.params, rank=4, key=jax.random.PRNGKey(1))
    # B = 0 → merge is bitwise the base tree
    merged = merge_adapters(m.params, adapters, scale=1.0)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(m.params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # hand-set A, B on one conv and one dense kernel → exact delta
    conv_path = next(p for p in adapters if "init_conv" in p)
    dense_path = next(
        p for p, ab in adapters.items() if ab["a"].shape[0] == ab["b"].shape[1] or "mlp" in p
    )
    key = jax.random.PRNGKey(2)
    for path in (conv_path, dense_path):
        ka, kb = jax.random.split(jax.random.fold_in(key, hash(path) % 1000))
        adapters[path] = {
            "a": jax.random.normal(ka, adapters[path]["a"].shape),
            "b": jax.random.normal(kb, adapters[path]["b"].shape),
        }
    scale = 2.0 / 4.0
    merged = merge_adapters(m.params, adapters, scale=scale)

    def get(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return np.asarray(node)

    for path in (conv_path, dense_path):
        w = get(m.params, path)
        ab = np.asarray(adapters[path]["a"]) @ np.asarray(adapters[path]["b"])
        np.testing.assert_allclose(
            get(merged, path), w + scale * ab.reshape(w.shape), rtol=1e-6, atol=1e-6
        )


# ---- 2. targeting ---------------------------------------------------------------------
def test_targeting_and_validation():
    from diffusion_model_nemo_tpu.training import lora_init
    from diffusion_model_nemo_tpu.training.lora import _walk_kernels, adapter_param_count

    m = _model()
    all_kernels = _walk_kernels(m.params)
    full = lora_init(m.params, rank=2, key=jax.random.PRNGKey(0))
    assert len(full) == len(all_kernels)

    attn_only = lora_init(m.params, rank=2, key=jax.random.PRNGKey(0), targets="attn")
    assert 0 < len(attn_only) < len(full)
    assert all("attn" in p for p in attn_only)

    # rank clamped: no factor exceeds min(fan_in, cout)
    big = lora_init(m.params, rank=4096, key=jax.random.PRNGKey(0))
    for p, ab in big.items():
        fan_in, r = ab["a"].shape
        r2, cout = ab["b"].shape
        assert r == r2 == min(fan_in, cout)

    with pytest.raises(ValueError):
        lora_init(m.params, rank=0, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        lora_init(m.params, rank=2, key=jax.random.PRNGKey(0), targets="no_such_kernel_xyz")
    assert adapter_param_count(full) > 0


# ---- 3. fine-tuning --------------------------------------------------------------------
def test_finetune_decreases_loss_frozen_base():
    from diffusion_model_nemo_tpu.training import LoRAFinetuner

    m = _model()
    base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), m.params)
    tuner = LoRAFinetuner(m, rank=4, learning_rate=2e-3)
    n_base = sum(int(p.size) for p in jax.tree.leaves(m.params))
    from diffusion_model_nemo_tpu.training.lora import adapter_param_count

    assert adapter_param_count(tuner.adapters) < 0.35 * n_base

    losses = tuner.finetune(_batches(), steps=40, key=jax.random.PRNGKey(3), log_every=5)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])

    # base untouched
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(m.params)[0],
        jax.tree_util.tree_flatten_with_path(base_snapshot)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), b)

    merged = tuner.merged_model()
    key = jax.random.PRNGKey(4)
    s_base = np.asarray(m.sample(batch_size=2, image_size=IMG, key=key))
    s_tuned = np.asarray(merged.sample(batch_size=2, image_size=IMG, key=key))
    assert np.isfinite(s_tuned).all()
    assert float(np.abs(s_tuned - s_base).max()) > 1e-5


# ---- 4. persistence ----------------------------------------------------------------------
def test_adapter_save_load_reapply(tmp_path):
    from diffusion_model_nemo_tpu.models import restore_model_from_archive
    from diffusion_model_nemo_tpu.training import LoRAFinetuner, load_adapters, merge_adapters

    m = _model()
    archive = m.save_to(str(tmp_path / "base.dmn"))
    tuner = LoRAFinetuner(m, rank=4, alpha=8.0, learning_rate=2e-3)
    tuner.finetune(_batches(), steps=10, key=jax.random.PRNGKey(5), log_every=0)
    ad_path = tuner.save_adapters(str(tmp_path / "adapters.npz"))
    key = jax.random.PRNGKey(6)
    want = np.asarray(tuner.merged_model().sample(batch_size=2, image_size=IMG, key=key))

    fresh = restore_model_from_archive(archive)
    adapters, rank, alpha, targets = load_adapters(ad_path)
    assert (rank, alpha, targets) == (4, 8.0, ".*")
    fresh.params = merge_adapters(fresh.params, adapters, alpha / rank)
    got = np.asarray(fresh.sample(batch_size=2, image_size=IMG, key=key))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---- 5. mesh equivalence ---------------------------------------------------------------
@pytest.mark.slow  # 24 s warm: mesh + single-device LoRA steps
def test_mesh_lora_step_matches_single_device():
    from diffusion_model_nemo_tpu.parallel import make_mesh
    from diffusion_model_nemo_tpu.training import LoRAFinetuner

    m = _model()
    batches = _batches(batch_size=16)
    key = jax.random.PRNGKey(7)

    plain = LoRAFinetuner(m, rank=2, optimizer="sgd", learning_rate=1e-2,
                          key=jax.random.PRNGKey(9))
    plain.finetune(_batches(batch_size=16), steps=3, key=key, log_every=0)

    mesh = make_mesh(jax.devices()[:8])
    sharded = LoRAFinetuner(m, rank=2, optimizer="sgd", learning_rate=1e-2,
                            mesh=mesh, key=jax.random.PRNGKey(9))
    sharded.finetune(batches, steps=3, key=key, log_every=0)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(plain.adapters)[0],
        jax.tree_util.tree_flatten_with_path(sharded.adapters)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
