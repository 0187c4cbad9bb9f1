"""InceptionV3-pool3 extractor: topology pins, weight conversion, FID wiring.

No pretrained weights exist in this zero-egress environment, so correctness
is pinned three ways: (1) layer-shape assertions against the known
torchvision ``inception_v3`` state_dict (exact key names + OIHW shapes),
(2) a lossless round trip flax → torch-state_dict → flax including the
torch.save/torch.load path ``load_inception_variables`` takes with real
checkpoint files, and (3) FID-machinery integration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-net parity vs torchvision Inception (78 s random-init fixture alone):
# slow-suite; quick FID math coverage lives in test_metrics.py/test_scores.py
pytestmark = pytest.mark.slow

from diffusion_model_nemo_tpu.metrics import FIDScorer
from diffusion_model_nemo_tpu.metrics.inception import (
    INCEPTION_FEATURE_DIM,
    InceptionV3,
    flax_to_torch_state_dict,
    inception_feature_fn,
    load_inception_variables,
    torch_state_dict_to_flax,
)


@pytest.fixture(scope="module")
def variables():
    model = InceptionV3()
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32))


@pytest.fixture(scope="module")
def apply_fn():
    model = InceptionV3()
    return jax.jit(lambda v, x: model.apply(v, x))


def test_pool3_features_shape_and_determinism(variables, apply_fn):
    x = InceptionV3.preprocess(np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    f1 = np.asarray(apply_fn(variables, x))
    f2 = np.asarray(apply_fn(variables, x))
    assert f1.shape == (2, INCEPTION_FEATURE_DIM)
    assert np.all(np.isfinite(f1))
    np.testing.assert_array_equal(f1, f2)


def test_state_dict_keys_and_shapes_match_torchvision(variables):
    """Pin the topology to torchvision's inception_v3: canonical key names
    and OIHW kernel shapes (sampled across every block type)."""
    sd = flax_to_torch_state_dict(variables)
    expected = {
        "Conv2d_1a_3x3.conv.weight": (32, 3, 3, 3),
        "Conv2d_2b_3x3.conv.weight": (64, 32, 3, 3),
        "Conv2d_4a_3x3.conv.weight": (192, 80, 3, 3),
        "Mixed_5b.branch5x5_2.conv.weight": (64, 48, 5, 5),
        "Mixed_5b.branch_pool.conv.weight": (32, 192, 1, 1),
        "Mixed_5c.branch_pool.conv.weight": (64, 256, 1, 1),
        "Mixed_5d.branch3x3dbl_3.conv.weight": (96, 96, 3, 3),
        "Mixed_6a.branch3x3.conv.weight": (384, 288, 3, 3),
        "Mixed_6b.branch7x7_2.conv.weight": (128, 128, 1, 7),
        "Mixed_6b.branch7x7_3.conv.weight": (192, 128, 7, 1),
        "Mixed_6c.branch7x7dbl_2.conv.weight": (160, 160, 7, 1),
        "Mixed_6e.branch7x7dbl_5.conv.weight": (192, 192, 1, 7),
        "Mixed_7a.branch3x3_2.conv.weight": (320, 192, 3, 3),
        "Mixed_7a.branch7x7x3_4.conv.weight": (192, 192, 3, 3),
        "Mixed_7b.branch3x3_2a.conv.weight": (384, 384, 1, 3),
        "Mixed_7c.branch3x3dbl_3b.conv.weight": (384, 384, 3, 1),
        "Mixed_7c.branch_pool.conv.weight": (192, 2048, 1, 1),
        "Mixed_7c.branch1x1.bn.running_var": (320,),
    }
    for key, shape in expected.items():
        assert key in sd, f"missing state_dict key {key}"
        assert sd[key].shape == shape, f"{key}: {sd[key].shape} != {shape}"


def test_weight_conversion_roundtrip(variables, apply_fn):
    sd = flax_to_torch_state_dict(variables)
    back = torch_state_dict_to_flax(sd)
    x = InceptionV3.preprocess(np.random.RandomState(1).randint(0, 256, (1, 64, 64, 3), dtype=np.uint8))
    np.testing.assert_allclose(
        np.asarray(apply_fn(variables, x)), np.asarray(apply_fn(back, x)), rtol=1e-6, atol=1e-6
    )


def test_load_from_torch_checkpoint_and_npz(tmp_path, variables, apply_fn):
    import torch

    sd = flax_to_torch_state_dict(variables)
    # heads present in real checkpoints must be ignored
    sd_with_heads = dict(sd)
    sd_with_heads["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd_with_heads["fc.bias"] = np.zeros((1000,), np.float32)
    sd_with_heads["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)

    pt = tmp_path / "inception.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_with_heads.items()}, pt)
    npz = tmp_path / "inception.npz"
    np.savez(npz, **{k: np.asarray(v) for k, v in sd_with_heads.items()})

    x = InceptionV3.preprocess(np.random.RandomState(2).randint(0, 256, (1, 32, 32, 1), dtype=np.uint8))
    ref = np.asarray(apply_fn(variables, x))
    for path in (pt, npz):
        loaded = load_inception_variables(str(path))
        np.testing.assert_allclose(np.asarray(apply_fn(loaded, x)), ref, rtol=1e-6, atol=1e-6)


def test_inception_fid_end_to_end(tmp_path):
    fn = inception_feature_fn(weights_path=None, batch_size=4)
    assert fn.using_random_weights

    rng = np.random.RandomState(0)
    real = rng.randint(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    scorer = FIDScorer(feature_fn=fn)
    scorer.update_real(real)
    scorer.update_generated(real.copy())
    fid_same = scorer.compute()

    scorer.reset()
    scorer.update_real(real)
    scorer.update_generated(255 - real)  # very different images
    fid_diff = scorer.compute()

    # With 8 samples of 2048-dim features the covariances are rank-deficient,
    # so "identical ≈ 0" only holds relative to sqrtm's numerical noise floor.
    assert fid_diff > 100 * max(abs(fid_same), 1e-12), (fid_same, fid_diff)
