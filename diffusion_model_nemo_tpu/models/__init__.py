from .abstract_diffusion_model import AbstractDiffusionModel
from .autoencoder_kl import AutoencoderKLModel
from .ddpm import DDPM
from .improved_ddpm import ImprovedDDPM
from .conditional_ddpm import ConditionalDDPM
from .conditional_edm import ConditionalEDM
from .edm import EDM
from .latent_diffusion import LatentDiffusion
from .rectified_flow import RectifiedFlow
from .score_sde import ScoreSDE
from .sr3 import SR3
from .text_conditional_ddpm import TextConditionalDDPM
from .wavegrad_ddpm import WavegradDDPM
from .wavegrad_vocoder import WavegradVocoderModel

_MODEL_CLASSES = {
    cls.__name__: cls
    for cls in (
        AutoencoderKLModel,
        DDPM,
        ImprovedDDPM,
        ConditionalDDPM,
        ConditionalEDM,
        EDM,
        LatentDiffusion,
        RectifiedFlow,
        ScoreSDE,
        SR3,
        TextConditionalDDPM,
        WavegradDDPM,
        WavegradVocoderModel,
    )
}


def restore_model_from_archive(path: str, use_ema: bool = False, trainer=None):
    """Restore WITHOUT knowing the model family: reads the ``model_class``
    name ``save_to`` records in the archive's extra metadata and dispatches
    to that class's ``restore_from``. Archives written before the class name
    was recorded restore as :class:`DDPM` (with a log note) — the class only
    changes training/eval behavior, not the sampling surface the serving
    daemon uses.

    ``path`` may also be a LOCAL-hub model name (utils/hub.py), so every
    archive-taking CLI (eval/serve/distill/...) accepts
    ``model_path=<hub name>`` directly.
    """
    import os

    from ..training import load_archive
    from ..utils import logging

    if not os.path.exists(str(path)):
        from ..utils import hub as hub_lib

        resolved = hub_lib.resolve_model_name(str(path))
        if resolved is not None:
            logging.info(f"Resolved hub model {path!r} -> {resolved}")
            path = str(resolved)

    _, _, _, extra = load_archive(path)
    name = (extra or {}).get("model_class")
    cls = _MODEL_CLASSES.get(name)
    if cls is None:
        logging.info(
            f"Archive {path} records no known model_class ({name!r}); restoring as DDPM"
        )
        cls = DDPM
    return cls.restore_from(path, trainer=trainer, use_ema=use_ema)
