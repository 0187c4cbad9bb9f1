from .fid import FIDScorer, compute_statistics, frechet_distance
from .inception import (
    INCEPTION_FEATURE_DIM,
    InceptionV3,
    inception_feature_fn,
    load_inception_variables,
)
from .scores import inception_score, kernel_inception_distance, polynomial_kernel
from .image_quality import psnr, ssim
