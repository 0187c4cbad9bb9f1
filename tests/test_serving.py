"""Batched sampling daemon (diffusion_model_nemo_tpu/serving/server.py).

Tiny model on CPU: request coalescing, fixed-shape device batching, seeded
determinism, archive auto-restore, and the HTTP surface end-to-end.
"""

import json
import threading
from pathlib import Path
import urllib.request

import numpy as np
import pytest

from diffusion_model_nemo_tpu.config import from_dict
from diffusion_model_nemo_tpu.models import DDPM, restore_model_from_archive
from diffusion_model_nemo_tpu.serving import BatchingSampler, SamplingServer

IMG = 8
T = 5


def tiny_model():
    import jax

    cfg = from_dict(
        {
            "image_size": IMG,
            "timesteps": T,
            "channels": 1,
            "save_every": 0,
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.Unet",
                "input_dim": IMG,
                "dim": 8,
                "channels": 1,
                "dim_mults": [1, 2],
                "use_convnext": False,
                "resnet_block_groups": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": T,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )
    model = DDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    return model


@pytest.fixture(scope="module")
def batcher():
    b = BatchingSampler(
        tiny_model(), image_size=IMG, max_batch=8, linger_ms=100.0, use_ema=False
    ).start()
    yield b
    b.stop()


def test_submit_returns_requested_count(batcher):
    out = batcher.submit(3, timeout=60)
    assert out.shape == (3, IMG, IMG, 1)
    # default transfer is device-quantized uint8 (4x smaller host copies)
    assert out.dtype == np.uint8


def test_float32_transfer_matches_uint8_quantization():
    from diffusion_model_nemo_tpu.utils.image import to_uint8

    b = BatchingSampler(
        tiny_model(), image_size=IMG, max_batch=4, linger_ms=1.0,
        use_ema=False, transfer="float32",
    ).start()
    try:
        f = b.submit(2, seed=5, timeout=60)
        assert f.dtype == np.float32
        assert f.min() >= 0.0 and f.max() <= 1.0
    finally:
        b.stop()
    b2 = BatchingSampler(
        tiny_model(), image_size=IMG, max_batch=4, linger_ms=1.0,
        use_ema=False, transfer="uint8",
    ).start()
    try:
        u = b2.submit(2, seed=5, timeout=60)
        assert u.dtype == np.uint8
        assert np.array_equal(u, to_uint8(f))
    finally:
        b2.stop()


def test_concurrent_requests_coalesce(batcher):
    before = dict(batcher.stats)
    results = {}

    def ask(name):
        results[name] = batcher.submit(2, timeout=60)

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results[i].shape == (2, IMG, IMG, 1) for i in range(3))
    # 3 unseeded same-label requests inside one linger window -> one device batch
    assert batcher.stats["batches"] - before["batches"] == 1
    assert batcher.stats["requests"] - before["requests"] == 3


def test_seeded_requests_are_deterministic(batcher):
    a = batcher.submit(2, seed=7, timeout=60)
    b = batcher.submit(2, seed=7, timeout=60)
    assert np.array_equal(a, b)
    c = batcher.submit(2, seed=8, timeout=60)
    assert not np.array_equal(a, c)


def test_large_request_chunks_at_fixed_shape(batcher):
    out = batcher.submit(11, seed=3, timeout=120)  # max_batch=8 -> 2 chunks
    assert out.shape == (11, IMG, IMG, 1)
    # chunking is itself deterministic
    again = batcher.submit(11, seed=3, timeout=120)
    assert np.array_equal(out, again)


def test_stats_snapshot(batcher):
    s = batcher.snapshot_stats()
    assert s["images"] >= 3
    assert s["max_batch"] == 8
    assert s["avg_batch_fill"] > 0


def test_archive_roundtrip_records_model_class(tmp_path):
    model = tiny_model()
    path = str(tmp_path / "tiny.dmn")
    model.save_to(path)
    restored = restore_model_from_archive(path)
    assert type(restored).__name__ == "DDPM"
    import jax

    a = jax.tree.leaves(model.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    assert np.array_equal(np.asarray(a), np.asarray(b))


def tiny_text_model():
    import jax

    from diffusion_model_nemo_tpu.models import TextConditionalDDPM

    cfg = from_dict(
        {
            "image_size": IMG,
            "timesteps": T,
            "channels": 1,
            "save_every": 0,
            "max_text_len": 8,
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.DiT",
                "input_dim": IMG,
                "dim": 32,
                "depth": 2,
                "heads": 4,
                "patch_size": 2,
                "channels": 1,
                "context_dim": 16,
                "context_vocab": 257,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": T,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )
    model = TextConditionalDDPM(cfg=cfg)
    model.init_params(jax.random.PRNGKey(0))
    # Randomize the zero-init ca_out kernels and output head so prompts
    # reach the pixels (the DiT is exactly zero at init by design).
    k = jax.random.PRNGKey(3)
    for name, block in model.params.items():
        if name.startswith("block_") and "ca_out" in block:
            k, sub = jax.random.split(k)
            kern = block["ca_out"]["kernel"]
            block["ca_out"]["kernel"] = 0.1 * jax.random.normal(sub, kern.shape, kern.dtype)
    head = model.params["final_linear"]["kernel"]
    model.params["final_linear"]["kernel"] = 0.1 * jax.random.normal(k, head.shape, head.dtype)
    model.ema_params = jax.tree.map(lambda x: x + 0.0, model.params)
    return model


def test_text_prompt_serving():
    """Text archives serve prompted /sample: prompts are per-image DATA, so
    requests with different prompts coalesce into ONE device batch; seeded
    prompted requests are deterministic; guided + negative prompts work;
    text on a non-text archive is rejected."""
    b = BatchingSampler(
        tiny_text_model(), image_size=IMG, max_batch=8, linger_ms=150.0, use_ema=False
    ).start()
    try:
        out = b.submit(2, seed=5, text="a cat", timeout=120)
        assert out.shape == (2, IMG, IMG, 1)
        again = b.submit(2, seed=5, text="a cat", timeout=120)
        assert np.array_equal(out, again)
        other = b.submit(2, seed=5, text="a dog", timeout=120)
        assert not np.array_equal(out, other)

        # different prompts coalesce: 3 unseeded requests, one device batch
        before = dict(b.stats)
        results = {}

        def ask(name, prompt):
            results[name] = b.submit(2, text=prompt, timeout=120)

        threads = [
            threading.Thread(target=ask, args=(i, p))
            for i, p in enumerate(["a cat", "a dog", None])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(results[i].shape == (2, IMG, IMG, 1) for i in range(3))
        assert b.stats["batches"] - before["batches"] == 1
        assert b.stats["requests"] - before["requests"] == 3

        # classifier-free guidance + negative prompt through the daemon
        g = b.submit(2, seed=5, text="a cat", guidance_scale=2.0, timeout=120)
        g2 = b.submit(
            2, seed=5, text="a cat", guidance_scale=2.0,
            negative_text="a dog", timeout=120,
        )
        assert g.shape == g2.shape == (2, IMG, IMG, 1)
        assert not np.array_equal(g, g2)
        # anchor == prompt collapses guidance to the plain prompted batch
        g3 = b.submit(
            2, seed=5, text="a cat", guidance_scale=3.0,
            negative_text="a cat", timeout=120,
        )
        np.testing.assert_allclose(
            g3.astype(np.float32), out.astype(np.float32), atol=2.0
        )

        with pytest.raises(ValueError, match="text prompt"):
            b.submit(1, guidance_scale=2.0, timeout=30)
        with pytest.raises(ValueError, match="guidance_scale"):
            b.submit(1, text="a cat", negative_text="a dog", timeout=30)
    finally:
        b.stop()


def test_text_rejected_on_plain_archive(batcher):
    with pytest.raises(ValueError, match="not text-conditional"):
        batcher.submit(1, text="a cat", timeout=30)


def test_edit_serving_roundtrip(batcher):
    """SDEdit over the serving stack: submit_edit round trip, seeded
    determinism, uint8 inputs, strength-0 near-identity, validation."""
    rng = np.random.default_rng(0)
    src = rng.uniform(0.1, 0.9, (3, IMG, IMG, 1)).astype(np.float32)
    out = batcher.submit_edit(src, strength=0.6, seed=4, timeout=120)
    assert out.shape == (3, IMG, IMG, 1)
    again = batcher.submit_edit(src, strength=0.6, seed=4, timeout=120)
    assert np.array_equal(out, again)
    # uint8 inputs land on the same [0,1] floats
    u8 = (src * 255.0 + 0.5).astype(np.uint8)
    out_u8 = batcher.submit_edit(u8, strength=0.6, seed=4, timeout=120)
    np.testing.assert_allclose(
        out_u8.astype(np.float32), out.astype(np.float32), atol=2.0
    )
    # strength=0: only the t=0 forward noise separates output from input
    ident = batcher.submit_edit(src, strength=0.0, seed=4, timeout=120)
    assert np.abs(ident.astype(np.float32) / 255.0 - src).max() < 0.1
    # oversized request chunks at the compiled shape (max_batch=8)
    big = rng.uniform(0.1, 0.9, (11, IMG, IMG, 1)).astype(np.float32)
    out_big = batcher.submit_edit(big, strength=0.6, seed=7, timeout=240)
    assert out_big.shape == (11, IMG, IMG, 1)

    with pytest.raises(ValueError, match="strength"):
        batcher.submit_edit(src, strength=1.5, timeout=30)
    with pytest.raises(ValueError, match=r"\[n, H, W, C\]"):
        batcher.submit_edit(src[0], timeout=30)
    with pytest.raises(ValueError, match="edit inputs"):
        batcher.submit_edit(np.zeros((1, IMG * 2, IMG * 2, 1), np.float32), timeout=30)
    # float inputs in [0, 255] (a common client mistake) are rejected, not
    # silently turned into garbage edits (ADVICE r3)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        batcher.submit_edit(src * 255.0, strength=0.5, timeout=30)


def test_edit_http_surface(batcher):
    import base64
    import io

    server = SamplingServer(batcher, host="127.0.0.1", port=0)
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        src = np.random.default_rng(1).uniform(0, 1, (2, IMG, IMG, 1)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, src)
        req = urllib.request.Request(
            f"{base}/edit",
            data=json.dumps(
                {
                    "images_npy": base64.b64encode(buf.getvalue()).decode("ascii"),
                    "strength": 0.5,
                    "seed": 2,
                    "format": "npy",
                }
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=240) as r:
            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (2, IMG, IMG, 1)
        # client errors all map to 400, not 500 (ADVICE r3): missing images,
        # out-of-range strength, malformed base64, non-numeric strength
        bad_payloads = [
            {"strength": 0.5},  # missing images_npy
            {"images_npy": base64.b64encode(buf.getvalue()).decode("ascii"),
             "strength": 7.0},  # out-of-range strength
            {"images_npy": "!!!not-base64!!!", "strength": 0.5},
            {"images_npy": base64.b64encode(buf.getvalue()).decode("ascii"),
             "strength": "a lot"},  # non-numeric strength
        ]
        for payload in bad_payloads:
            req = urllib.request.Request(
                f"{base}/edit", data=json.dumps(payload).encode(), method="POST"
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, f"expected HTTP 400 for {payload.keys()}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, (e.code, payload)
    finally:
        server._httpd.shutdown()
        server._httpd.server_close()


def test_http_surface(batcher):
    server = SamplingServer(batcher, host="127.0.0.1", port=0)  # ephemeral port
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        req = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"num_images": 2, "seed": 1, "format": "png"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert len(payload["images"]) == 2
        import base64

        png = base64.b64decode(payload["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        req = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"num_images": 2, "seed": 1, "format": "npy"}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            import io

            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (2, IMG, IMG, 1)

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["images"] >= 2
    finally:
        server._httpd.shutdown()
        server._httpd.server_close()


def test_response_path_fault_reports_500_not_400(batcher, monkeypatch):
    """The 400 mapping is scoped to payload decode + submit validation
    (ADVICE r4): a server-side bug of a client-looking exception type
    (ValueError) raised AFTER validation — here in the PNG encode of the
    response path — must surface as 500, not as the caller's fault."""
    import diffusion_model_nemo_tpu.serving.server as server_mod

    def boom(im):
        raise ValueError("server-side encode bug")

    monkeypatch.setattr(server_mod, "_png_b64", boom)
    server = SamplingServer(batcher, host="127.0.0.1", port=0)
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        req = urllib.request.Request(
            f"{base}/sample",
            data=json.dumps({"num_images": 1, "seed": 3, "format": "png"}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500, e.code
            assert "server-side encode bug" in e.read().decode()
    finally:
        server._httpd.shutdown()
        server._httpd.server_close()


def test_mesh_sharded_serving_matches_single_device():
    """BatchingSampler(mesh=...) shards each fixed-shape batch over the data
    axis; a seeded request must return the same images as single-device
    serving (the tests/test_parallel.py sharded-sampling guarantee, carried
    through the serving stack)."""
    from diffusion_model_nemo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices
    b_mesh = BatchingSampler(
        tiny_model(), image_size=IMG, max_batch=8, linger_ms=1.0,
        use_ema=False, transfer="float32", mesh=mesh,
    ).start()
    try:
        sharded = b_mesh.submit(5, seed=11, timeout=120)
        assert sharded.shape == (5, IMG, IMG, 1)
    finally:
        b_mesh.stop()

    b_plain = BatchingSampler(
        tiny_model(), image_size=IMG, max_batch=8, linger_ms=1.0,
        use_ema=False, transfer="float32",
    ).start()
    try:
        plain = b_plain.submit(5, seed=11, timeout=120)
    finally:
        b_plain.stop()
    np.testing.assert_allclose(sharded, plain, atol=2e-5)


def test_mesh_batch_divisibility_validated():
    from diffusion_model_nemo_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="divisible"):
        BatchingSampler(
            tiny_model(), image_size=IMG, max_batch=6, use_ema=False,
            mesh=make_mesh(),
        )


def test_serve_devices_builds_mesh(tmp_path):
    """serve(devices=-1) builds the data mesh and serves sharded batches."""
    from diffusion_model_nemo_tpu.serving import serve as serve_fn

    model = tiny_model()
    path = str(tmp_path / "tiny.dmn")
    model.save_to(path)
    server = serve_fn(
        model_path=path, port=0, max_batch=8, linger_ms=1.0,
        use_ddim_sampler=False, devices=-1, transfer="float32",
    )
    try:
        assert server.batcher.mesh is not None
        assert int(server.batcher.mesh.shape["data"]) == 8
        out = server.batcher.submit(3, seed=2, timeout=120)
        assert out.shape == (3, IMG, IMG, 1)
    finally:
        server.shutdown()


def test_serve_dpm_solver_swap(tmp_path):
    """serve(use_dpm_solver=True) hot-swaps the archive's sampler to
    DPM-Solver++ (the production fast path)."""
    from diffusion_model_nemo_tpu.modules import DPMSolverDiffusion
    from diffusion_model_nemo_tpu.serving import serve as serve_fn

    model = tiny_model()
    path = str(tmp_path / "tiny.dmn")
    model.save_to(path)
    server = serve_fn(
        model_path=path, port=0, max_batch=4, linger_ms=1.0,
        use_dpm_solver=True, dpm_steps=5, transfer="float32",
    )
    try:
        assert isinstance(server.batcher.model.sampler, DPMSolverDiffusion)
        out = server.batcher.submit(2, seed=1, timeout=120)
        assert out.shape == (2, IMG, IMG, 1)
        assert np.isfinite(out).all()
    finally:
        server.shutdown()


def _tiny_sr3_model():
    import jax

    from tests.test_sr3 import _model

    return _model()


def test_sr3_serving_roundtrip():
    """SR3 archives serve /super_resolve: submit_sr round trip, seeded
    determinism, input validation, and /sample rejected."""
    m = _tiny_sr3_model()
    scale = int(m.scale_factor)
    b = BatchingSampler(
        m, image_size=IMG, max_batch=4, linger_ms=1.0, use_ema=False,
        transfer="float32",
    ).start()
    try:
        assert b.sr_mode and b.lr_size == IMG // scale
        with pytest.raises(ValueError, match="super_resolution|super_resolve|SR3"):
            b.submit(1, timeout=30)
        lr = np.random.default_rng(0).random((3, IMG // scale, IMG // scale, 1)).astype(np.float32)
        out = b.submit_sr(lr, seed=3, timeout=120)
        assert out.shape == (3, IMG, IMG, 1)
        assert np.isfinite(out).all()
        again = b.submit_sr(lr, seed=3, timeout=120)
        assert np.array_equal(out, again)
        # uint8 inputs accepted (normalized to [0,1])
        u8 = (lr * 255).astype(np.uint8)
        out_u8 = b.submit_sr(u8, seed=3, timeout=120)
        assert out_u8.shape == (3, IMG, IMG, 1)
        # oversized requests chunk at the compiled shape
        big = np.random.default_rng(1).random((6, IMG // scale, IMG // scale, 1)).astype(np.float32)
        out_big = b.submit_sr(big, seed=7, timeout=120)
        assert out_big.shape == (6, IMG, IMG, 1)
        with pytest.raises(ValueError, match="LR inputs"):
            b.submit_sr(np.zeros((1, IMG, IMG, 1), np.float32), timeout=30)
        with pytest.raises(ValueError, match=r"\[n, h, w, C\]"):
            b.submit_sr(np.zeros((IMG, IMG, 1), np.float32), timeout=30)
    finally:
        b.stop()


def test_sr3_http_surface():
    import base64
    import io

    m = _tiny_sr3_model()
    scale = int(m.scale_factor)
    b = BatchingSampler(
        m, image_size=IMG, max_batch=4, linger_ms=1.0, use_ema=False,
        transfer="float32",
    ).start()
    server = SamplingServer(b, host="127.0.0.1", port=0)
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["mode"] == "super_resolve"

        lr = np.random.default_rng(2).random((2, IMG // scale, IMG // scale, 1)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, lr)
        req = urllib.request.Request(
            f"{base}/super_resolve",
            data=json.dumps(
                {"images_npy": base64.b64encode(buf.getvalue()).decode(),
                 "seed": 1, "format": "npy"}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (2, IMG, IMG, 1)

        # missing payload -> 400
        req = urllib.request.Request(
            f"{base}/super_resolve", data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        # /sample on an SR archive -> client error (route exists, mode
        # mismatch: the archive cannot serve it -> 400)
        req = urllib.request.Request(
            f"{base}/sample", data=json.dumps({"num_images": 1}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server._httpd.shutdown()
        server._httpd.server_close()
        b.stop()


def test_guidance_rejected_on_unconditional_model(batcher):
    with pytest.raises(ValueError, match="conditional"):
        batcher.submit(1, guidance_scale=2.0, timeout=30)


def test_guided_serving_conditional_model():
    """guidance_scale flows submit → coalescing (grouped by w) → sample()."""
    from tests.test_cfg_guidance import make_model
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        model = make_model(Path(d))
    b = BatchingSampler(model, image_size=IMG, max_batch=4, linger_ms=20.0,
                        use_ema=False).start()
    try:
        plain = b.submit(2, seed=5, label=1, timeout=120)
        guided = b.submit(2, seed=5, label=1, guidance_scale=3.0, timeout=120)
        assert plain.shape == guided.shape == (2, IMG, IMG, 1)
        assert not np.array_equal(plain, guided)
        again = b.submit(2, seed=5, label=1, guidance_scale=3.0, timeout=120)
        assert np.array_equal(guided, again)
    finally:
        b.stop()


# ---- WaveGrad vocoder serving (/vocode) ---------------------------------------
def _tiny_vocoder_model():
    import jax

    from tests.test_wavegrad_vocoder import vocoder_cfg

    m = __import__(
        "diffusion_model_nemo_tpu.models", fromlist=["WavegradVocoderModel"]
    ).WavegradVocoderModel(cfg=vocoder_cfg(None))
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_vocoder_serving_roundtrip():
    """Vocoder archives serve /vocode: submit_vocode round trip, seeded
    determinism, chunking, validation, /sample rejected, float transfer
    forced (waveforms are signed)."""
    m = _tiny_vocoder_model()
    F, M = m.segment_frames, m.n_mels
    b = BatchingSampler(
        m, image_size=0, max_batch=4, linger_ms=1.0, use_ema=False,
        transfer="uint8",  # must be overridden to float32 in vocode mode
    ).start()
    try:
        assert b.vocode_mode and b.mel_frames == F and b._to_u8 is None
        with pytest.raises(ValueError, match="vocoder|vocode"):
            b.submit(1, timeout=30)
        mel = np.random.default_rng(0).normal(size=(3, F, M)).astype(np.float32)
        out = b.submit_vocode(mel, seed=3, timeout=120)
        assert out.shape == (3, F * m.hop)
        assert out.dtype == np.float32 and np.isfinite(out).all()
        assert np.array_equal(out, b.submit_vocode(mel, seed=3, timeout=120))
        big = np.random.default_rng(1).normal(size=(6, F, M)).astype(np.float32)
        assert b.submit_vocode(big, seed=7, timeout=120).shape == (6, F * m.hop)
        with pytest.raises(ValueError, match="mel inputs"):
            b.submit_vocode(np.zeros((1, F + 1, M), np.float32), timeout=30)
        with pytest.raises(ValueError, match=r"\[n, F, n_mels\]"):
            b.submit_vocode(np.zeros((F, M), np.float32), timeout=30)
    finally:
        b.stop()


def test_vocoder_http_surface(tmp_path):
    """Archive → serve() restore → POST /vocode over HTTP; sampler-swap flags
    rejected loudly for vocoder archives."""
    import base64
    import io

    from diffusion_model_nemo_tpu.serving import serve

    m = _tiny_vocoder_model()
    archive = tmp_path / "Voc.dmn"
    m.save_to(str(archive))

    with pytest.raises(ValueError, match="vocoder archives keep"):
        serve(str(archive), port=0, use_ddim_sampler=True)

    server = serve(
        str(archive), port=0, max_batch=4, linger_ms=1.0,
        use_ddim_sampler=False, use_ema=False,
    )
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["mode"] == "vocode"
        F, M = m.segment_frames, m.n_mels
        mel = np.random.default_rng(2).normal(size=(2, F, M)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, mel)
        req = urllib.request.Request(
            f"{base}/vocode",
            data=json.dumps(
                {"mel_npy": base64.b64encode(buf.getvalue()).decode(), "seed": 1}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            arr = np.load(io.BytesIO(r.read()))
        assert arr.shape == (2, F * m.hop) and arr.dtype == np.float32

        req = urllib.request.Request(f"{base}/vocode", data=b"{}", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        req = urllib.request.Request(
            f"{base}/sample", data=json.dumps({"num_images": 1}).encode(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400  # mode mismatch is the client's error
    finally:
        server.shutdown()


def test_latent_diffusion_serving_roundtrip(tmp_path):
    """A LatentDiffusion archive serves /sample like any DDPM-family model:
    the generic restore rebuilds the embedded first stage and the batcher's
    fixed-shape jit runs latent scan + decode end to end."""
    import jax

    from diffusion_model_nemo_tpu.models import AutoencoderKLModel, LatentDiffusion

    ae_cfg = from_dict(
        {
            "image_size": IMG,
            "channels": 1,
            "kl_weight": 1e-6,
            "save_every": 0,
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.AutoencoderKL",
                "dim": 8,
                "dim_mults": [1, 2],
                "z_channels": 2,
                "channels": 1,
                "resnet_block_groups": 4,
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l1"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )
    ae = AutoencoderKLModel(cfg=ae_cfg)
    ae.init_params(jax.random.PRNGKey(0))
    ae_path = ae.save_to(str(tmp_path / "ae.dmn"))

    ld_cfg = from_dict(
        {
            "image_size": IMG,
            "timesteps": T,
            "channels": 1,
            "save_every": 0,
            "first_stage": {"restore_from": ae_path},
            "diffusion_model": {
                "_target_": "diffusion_model_nemo.modules.Unet",
                "input_dim": IMG // 2,
                "dim": 8,
                "channels": 2,
                "dim_mults": [1, 2],
                "use_convnext": False,
                "resnet_block_groups": 4,
            },
            "sampler": {
                "_target_": "diffusion_model_nemo.modules.GaussianDiffusion",
                "timesteps": T,
                "schedule_name": "linear",
            },
            "loss": {"_target_": "diffusion_model_nemo.loss.DiffusionLoss", "loss_type": "l2"},
            "optim": {"name": "adamw", "lr": 1e-3},
        }
    )
    ld = LatentDiffusion(cfg=ld_cfg)
    ld.init_params(jax.random.PRNGKey(0))
    path = ld.save_to(str(tmp_path / "ld.dmn"))

    model = restore_model_from_archive(path)
    assert type(model).__name__ == "LatentDiffusion"
    b = BatchingSampler(model, image_size=IMG, max_batch=4, linger_ms=1.0, use_ema=False).start()
    try:
        out = b.submit(3, seed=1, timeout=120)
        assert out.shape == (3, IMG, IMG, 1)
        assert out.dtype == np.uint8
        # seeded determinism through the latent chain + decode
        again = b.submit(3, seed=1, timeout=120)
        np.testing.assert_array_equal(out, again)
    finally:
        b.stop()
