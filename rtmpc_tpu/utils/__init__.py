from .polytope import (
    Polytope,
    box,
    support,
    support_lp_batch,
    support_many,
    pont_diff,
    mink_sum,
    scale,
    convex_hull,
    extreme,
    reduce_poly,
    intersect,
    contains,
    poly_subset,
    poly_equal,
)
from .synthesis import dlqr, dlyap, c2d
from .qp_ref import solve_qp_dense

__all__ = [
    "Polytope", "box", "support", "support_lp_batch", "support_many", "pont_diff", "mink_sum",
    "scale", "convex_hull", "extreme", "reduce_poly", "intersect", "contains",
    "poly_subset", "poly_equal", "dlqr", "dlyap", "c2d", "solve_qp_dense",
]
