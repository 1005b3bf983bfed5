from .invariant import (
    mrpi_rakovic,
    rpi_darup,
    max_admissible_set,
    determine_mrpi,
    tighten_constraints,
)

__all__ = ["mrpi_rakovic", "rpi_darup", "max_admissible_set",
           "determine_mrpi", "tighten_constraints"]
