from . import logging
from .compile_cache import enable_persistent_compilation_cache, maybe_enable_from_env
from ..ops.math import (
    LOG2,
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    log,
    mean_flattened,
    normal_kl,
    num_to_groups,
)


def exists(x):
    return x is not None


def default(val, d):
    if val is not None:
        return val
    return d() if callable(d) else d
