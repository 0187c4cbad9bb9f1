from .sde_lib import SDE, ReverseSDE, batch_mul
from .vp_sde import VPSDE
from .sub_vp_sde import subVPSDE
from .ve_sde import VESDE
from .likelihood import LikelihoodEstimate
