from sdwebui_tpu.sampling.discretization import Discretization, make_alphas_cumprod  # noqa: F401
from sdwebui_tpu.sampling.schedulers import get_schedule, SCHEDULERS  # noqa: F401
from sdwebui_tpu.sampling.solvers import SOLVERS, SolverSpec  # noqa: F401
