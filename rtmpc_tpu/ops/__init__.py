from .assembly import QPTemplate, build_mpc_qp
from .qp import ADMMSpec, ADMMState, prepare_admm, admm_solve, init_admm_state

__all__ = ["QPTemplate", "build_mpc_qp", "ADMMSpec", "ADMMState",
           "prepare_admm", "admm_solve", "init_admm_state"]
