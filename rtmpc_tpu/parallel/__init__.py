from .rollout import (
    RolloutCarry, StepOutputs, make_rollout_fn, make_batched_rollout,
    init_carry, tracking_error_rms,
)

__all__ = ["RolloutCarry", "StepOutputs", "make_rollout_fn",
           "make_batched_rollout", "init_carry", "tracking_error_rms"]
