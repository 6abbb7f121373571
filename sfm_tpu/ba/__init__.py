from sfm_tpu.ba.problem import BAProblem, build_problem  # noqa: F401
from sfm_tpu.ba.model import residuals, total_cost, jacobian_blocks  # noqa: F401
from sfm_tpu.ba.solver import solve_lm, LMState  # noqa: F401
from sfm_tpu.ba.run import bundle_adjust  # noqa: F401
