from .diffusion_process import AbstractDiffusionProcess, ModelFn
from .gaussian_diffusion import GaussianDiffusion, PMeanVariance
from .generalized_gaussian_diffusion import GeneralizedGaussianDiffusion
from .dpm_solver import DPMSolverDiffusion
from .unipc import UniPCDiffusion
from .karras_diffusion import KarrasDiffusion
from .consistency_sampler import ConsistencySampler
from .edm_diffusion import EDMProcess
from .rectified_flow import RectifiedFlowProcess
from .repaint import repaint_loop, repaint_schedule
from .learned_gaussian_diffusion import LearnedGaussianDiffusion
from .wavegrad_diffusion import WaveGradDiffusion
from .parts import (
    Attention,
    Block,
    ConvNextBlock,
    Downsample,
    FeatureWiseLinearModulation,
    LinearAttention,
    PositionalEncoding,
    PreNorm,
    Residual,
    ResnetBlock,
    SelfAttentionBlock,
    SinusoidalPositionEmbeddings,
    Upsample,
)
from .dit import DiT
from .unet import Unet, WaveGradUNet
from .autoencoder import (
    AutoencoderKL,
    diagonal_gaussian_kl,
    diagonal_gaussian_sample,
)
from .wavegrad_audio import WaveGradVocoder
from . import sde_lib
from .sde_lib import SDE, VESDE, VPSDE, LikelihoodEstimate, subVPSDE
from .sde_predictors import (
    AncestralSamplingPredictor,
    EulerMaruyamaPredictor,
    NonePredictor,
    Predictor,
    ReverseDiffusionPredictor,
    get_predictor,
    register_predictor,
)
from .sde_correctors import (
    AnnealedLangevinDynamics,
    Corrector,
    LangevinCorrector,
    NoneCorrector,
    get_corrector,
    register_corrector,
)
from .sde_samplers import PredictorCorrectorSampler, ProbabilityFlowSampler
from ..ops.schedules import (
    cosine_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)
