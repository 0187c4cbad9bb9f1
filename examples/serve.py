"""Serve a trained archive as a batched sampling daemon (production path).

Beyond the reference's CLI surface: the reference's only way to get samples
from a trained model is the one-shot eval scripts (examples/*/eval_*.py);
this stands up a long-lived HTTP service with dynamic request batching over
the cached-jit samplers (diffusion_model_nemo_tpu/serving/server.py).

    python examples/serve.py model_path=DDPM.dmn port=8000 max_batch=64 \
        use_ddim_sampler=true ddim_timesteps=50

    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/sample \
        -d '{"num_images": 4, "seed": 0, "format": "png"}'
    curl -s localhost:8000/stats
"""

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from common import hydra_runner


@dataclass
class ServeConfig:
    model_path: str = "DDPM.dmn"
    host: str = "127.0.0.1"
    port: int = 8000

    # Device batching
    devices: int = 1             # chips to serve on (-1 = all); >1 shards batches over a data mesh
    max_batch: int = 64          # compiled batch size (fixed shape, one compile)
    linger_ms: float = 5.0       # coalescing window for concurrent requests
    use_ema: bool = True
    base_seed: int = 0
    transfer: str = "uint8"   # device-quantized responses; "float32" for raw

    # Sampler (production serving usually wants the fast sampler)
    use_ddim_sampler: bool = True
    ddim_timesteps: int = 50
    ddim_eta: float = 0.0
    use_dpm_solver: bool = False  # DPM-Solver++(2M): overrides DDIM when true
    dpm_steps: int = 20
    dpm_order: int = 2
    dpm_time_spacing: str = "strided"
    use_karras_sampler: bool = False  # EDM Heun/churn: overrides both when true
    karras_steps: int = 18
    karras_order: int = 2
    karras_s_churn: float = 0.0
    use_unipc: bool = False  # UniPC predictor-corrector: overrides all when true
    unipc_steps: int = 20
    unipc_order: int = 2
    unipc_corrector: bool = True

    image_size: Optional[int] = None  # default: the archive's image_size
    mel_frames: Optional[int] = None  # vocoder archives: compiled mel length
                                      # (default: the archive's segment_frames)

    # Persistent XLA compile cache: daemon restarts skip the warmup compile.
    compile_cache_dir: Optional[str] = None


@hydra_runner(config_path=None, config_name="ServeConfig", schema=ServeConfig)
def main(cfg):
    cfg = ServeConfig(**cfg)
    from diffusion_model_nemo_tpu.serving import serve

    server = serve(
        model_path=cfg.model_path,
        host=cfg.host,
        port=cfg.port,
        max_batch=cfg.max_batch,
        linger_ms=cfg.linger_ms,
        use_ema=cfg.use_ema,
        use_ddim_sampler=cfg.use_ddim_sampler,
        ddim_timesteps=cfg.ddim_timesteps,
        ddim_eta=cfg.ddim_eta,
        use_dpm_solver=cfg.use_dpm_solver,
        dpm_steps=cfg.dpm_steps,
        dpm_order=cfg.dpm_order,
        dpm_time_spacing=cfg.dpm_time_spacing,
        use_karras_sampler=cfg.use_karras_sampler,
        karras_steps=cfg.karras_steps,
        karras_order=cfg.karras_order,
        karras_s_churn=cfg.karras_s_churn,
        use_unipc=cfg.use_unipc,
        unipc_steps=cfg.unipc_steps,
        unipc_order=cfg.unipc_order,
        unipc_corrector=cfg.unipc_corrector,
        image_size=cfg.image_size,
        base_seed=cfg.base_seed,
        transfer=cfg.transfer,
        compile_cache_dir=cfg.compile_cache_dir,
        devices=cfg.devices,
        mel_frames=cfg.mel_frames,
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
