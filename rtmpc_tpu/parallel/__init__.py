from .rollout import (
    RolloutCarry, StepOutputs, make_rollout_fn, make_batched_rollout,
    init_carry, tracking_error_rms,
)
from .distributed import (
    initialize_from_env, global_dp_mesh, distributed_mc_arrays,
)

__all__ = ["RolloutCarry", "StepOutputs", "make_rollout_fn",
           "make_batched_rollout", "init_carry", "tracking_error_rms",
           "initialize_from_env", "global_dp_mesh",
           "distributed_mc_arrays"]
