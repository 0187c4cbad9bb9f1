from .edm_loss import EDMLoss
from .simple_loss import DiffusionLoss
from .variational_bound_loss import VariationalBoundLoss, compute_variational_loss_terms
from .sde_loss import SDEScoreFunctionLoss, resolve_score_function
