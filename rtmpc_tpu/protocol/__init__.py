from .actuator import ActuatorState, init_actuator, actuator_step
from .estimator import (EstimatorState, init_estimator, store_sequence,
                        estimator_update)
from .network import draw_loss_masks, draw_disturbances

__all__ = ["ActuatorState", "init_actuator", "actuator_step",
           "EstimatorState", "init_estimator", "store_sequence",
           "estimator_update", "draw_loss_masks", "draw_disturbances"]
