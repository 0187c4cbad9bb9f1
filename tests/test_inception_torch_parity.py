"""Numerical (forward-math) parity of the Inception FID extractor vs torch
(VERDICT r2 item 4).

torchvision is not installed here, so the torch side is HAND-BUILT from the
published torchvision ``inception_v3`` topology + the pytorch-fid variant
switches (``count_include_pad=False`` avg pools, Mixed_7c max-pool branch) —
the same replica pattern as tests/test_torch_parity_unet.py. Weights
(including BN running stats, randomized so swapped mean/var or a wrong eps
cannot hide) are transplanted through ``flax_to_torch_state_dict`` and the
pool3 features compared elementwise. This turns metrics/inception.py's
pytorch-fid compatibility claim into tested math rather than tested key
spelling — before real weights ever arrive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from diffusion_model_nemo_tpu.metrics.inception import (
    BasicConv2d,
    InceptionA,
    InceptionC,
    InceptionE,
    InceptionV3,
    flax_to_torch_state_dict,
)


# ------------------------------------------------------------ torch replicas
class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, kernel, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, kernel, stride=stride, padding=padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features, fid_variant=True):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, 1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, 1)
        self.branch5x5_2 = TBasicConv2d(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, 3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, 1)
        self.fid = fid_variant

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not self.fid)
        return torch.cat([b1, b5, b3, self.branch_pool(bp)], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7, fid_variant=True):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, 1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, 1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, 1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, 1)
        self.fid = fid_variant

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x))))
        )
        bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not self.fid)
        return torch.cat([b1, b7, bd, self.branch_pool(bp)], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, 1)
        self.branch3x3_2 = TBasicConv2d(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, 1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool_type="avg", fid_variant=True):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 320, 1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, 1)
        self.branch3x3_2a = TBasicConv2d(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, 1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, 1)
        self.pool_type = pool_type
        self.fid = fid_variant

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_type == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not self.fid)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class TInceptionV3(tnn.Module):
    """Trunk-only torchvision inception_v3 with the pytorch-fid switches."""

    def __init__(self, fid_variant=True):
        super().__init__()
        fv = fid_variant
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, 3)
        self.Mixed_5b = TInceptionA(192, 32, fv)
        self.Mixed_5c = TInceptionA(256, 64, fv)
        self.Mixed_5d = TInceptionA(288, 64, fv)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128, fv)
        self.Mixed_6c = TInceptionC(768, 160, fv)
        self.Mixed_6d = TInceptionC(768, 160, fv)
        self.Mixed_6e = TInceptionC(768, 192, fv)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg", fv)
        self.Mixed_7c = TInceptionE(2048, "max" if fv else "avg", fv)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(self.Mixed_6a(x)))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        return x.mean(dim=(2, 3))  # pool3 [B, 2048]


# --------------------------------------------------------------- helpers
def randomize_variables(variables, seed):
    """Random params AND BN running stats so BN mean/var swaps, wrong eps or
    missed ReLU cannot cancel out."""
    rng = np.random.RandomState(seed)

    def walk(node, stat_name=None):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, stat_name)
            else:
                shape = np.shape(v)
                if k in ("scale", "var"):
                    out[k] = jnp.asarray(rng.uniform(0.5, 1.5, shape).astype(np.float32))
                elif k in ("bias", "mean"):
                    out[k] = jnp.asarray(rng.normal(0.0, 0.2, shape).astype(np.float32))
                else:  # conv kernel
                    out[k] = jnp.asarray(rng.normal(0.0, 0.05, shape).astype(np.float32))
        return out

    return {c: walk(t) for c, t in variables.items()}


def transplant(flax_module, variables, torch_module):
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          flax_to_torch_state_dict(variables).items()}
    missing, unexpected = torch_module.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    torch_module.eval()


def compare(flax_module, torch_module, cin, hw, seed, tol=1e-4):
    variables = flax_module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, hw, hw, cin), jnp.float32)
    )
    variables = randomize_variables(variables, seed)
    transplant(flax_module, variables, torch_module)

    x = np.random.RandomState(seed + 100).normal(0, 1, (2, hw, hw, cin)).astype(np.float32)
    got = np.asarray(flax_module.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = torch_module(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    if ref.ndim == 4:
        ref = ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


# ------------------------------------------------------------------- tests
def test_basic_conv_bn_relu_parity():
    """BN eps=1e-3 with frozen (randomized) running stats."""
    compare(BasicConv2d(16, (3, 3), padding=((1, 1), (1, 1))), TBasicConv2d(8, 16, 3, padding=1), 8, 9, 0)


@pytest.mark.parametrize("fid_variant", [True, False])
def test_inception_a_parity(fid_variant):
    """count_include_pad=False avg pool (FID variant) vs plain torchvision."""
    compare(
        InceptionA(32, fid_variant=fid_variant),
        TInceptionA(48, 32, fid_variant),
        48, 11, 1 + fid_variant,
    )


def test_inception_c_parity():
    """Asymmetric (1,7)/(7,1) kernels and their paddings."""
    compare(InceptionC(64, fid_variant=True), TInceptionC(96, 64, True), 96, 9, 3)


@pytest.mark.parametrize("pool_type", ["avg", "max"])
def test_inception_e_parity(pool_type):
    """Mixed_7b (avg) and the FID-variant Mixed_7c (max-pool branch)."""
    compare(
        InceptionE(pool_type=pool_type, fid_variant=True),
        TInceptionE(128, pool_type, True),
        128, 9, 4,
    )


@pytest.mark.slow
def test_full_pool3_features_parity():
    """End-to-end: stem convs + both stem max pools + every block + the final
    global mean, at the real 299x299 input size, FID variant."""
    model = InceptionV3(fid_variant=True)
    replica = TInceptionV3(fid_variant=True)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 299, 299, 3), jnp.float32))
    variables = randomize_variables(variables, 7)
    transplant(model, variables, replica)

    x = np.random.RandomState(42).uniform(-1, 1, (1, 299, 299, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = replica(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_preprocess_resize_matches_torch_bilinear():
    """pytorch-fid resizes with F.interpolate(bilinear, align_corners=False);
    jax.image.resize('bilinear') must agree."""
    x = np.random.RandomState(9).randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(InceptionV3.preprocess(x, size=75))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2)).float() / 255.0
        ref = F.interpolate(t, size=(75, 75), mode="bilinear", align_corners=False)
        ref = (ref * 2.0 - 1.0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
