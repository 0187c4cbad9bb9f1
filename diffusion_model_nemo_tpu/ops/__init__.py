from .attention import attention_reference, fused_attention
from .norm import group_norm_silu, group_norm_silu_reference
from .ode import ODESolution, odeint_rk45
from .math import (
    LOG2,
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    log,
    mean_flattened,
    normal_kl,
    num_to_groups,
    sum_flattened,
)
from .schedules import (
    SCHEDULE_NAMES,
    CosineSchedule,
    LinearSchedule,
    QuadraticSchedule,
    ScheduleConstants,
    SigmoidSchedule,
    compute_schedule_constants,
    cosine_beta_schedule,
    extract,
    get_named_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
)
