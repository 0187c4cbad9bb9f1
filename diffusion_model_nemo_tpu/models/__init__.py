from .abstract_diffusion_model import AbstractDiffusionModel
from .ddpm import DDPM
from .improved_ddpm import ImprovedDDPM
from .conditional_ddpm import ConditionalDDPM
from .score_sde import ScoreSDE
from .wavegrad_ddpm import WavegradDDPM
from .wavegrad_vocoder import WavegradVocoderModel
