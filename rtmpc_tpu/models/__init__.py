from .specs import (
    MPCSetup,
    ControllerArrays,
    ControllerConfig,
    setup_regulator,
    setup_tracking,
    setup_tube_regulator,
    setup_tube_tracking,
    setup_extended_tube_tracking,
)
from .plants import (
    CartpoleParams,
    cartpole_derivatives,
    cartpole_step,
    cartpole_linearized,
)

__all__ = [
    "MPCSetup", "ControllerArrays", "ControllerConfig",
    "setup_regulator", "setup_tracking", "setup_tube_regulator",
    "setup_tube_tracking", "setup_extended_tube_tracking",
    "CartpoleParams", "cartpole_derivatives", "cartpole_step",
    "cartpole_linearized",
]
