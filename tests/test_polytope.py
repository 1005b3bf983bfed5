"""Unit tests for the host polytope toolbox.

Oracles: analytic box/interval geometry plus the reference's own demo
configurations (``Examples of Set Operations``), whose expected results are
known in closed form for boxes.
"""

import numpy as np
import pytest

from rtmpc_tpu.utils.polytope import (
    Polytope, box, chebyshev_center, contains, convex_hull, extreme,
    intersect, mink_sum, poly_equal, poly_subset, pont_diff, reduce_poly,
    scale, support, support_many,
)


def test_box_support_analytic():
    P = box(np.array([2.0, 3.0]))  # |x1|<=2, |x2|<=3
    assert support(P, np.array([1.0, 0.0]), use_vrep=False) == pytest.approx(2.0)
    assert support(P, np.array([0.0, -1.0]), use_vrep=False) == pytest.approx(3.0)
    # support of box along (1,1) = 2+3
    assert support(P, np.array([1.0, 1.0]), use_vrep=False) == pytest.approx(5.0)
    # V-rep path agrees with LP path
    P.get_vertices()
    assert support(P, np.array([1.0, 1.0])) == pytest.approx(5.0)


def test_support_many_matches_single():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(12, 3))
    P = box(np.array([1.0, 2.0, 0.5]))
    sup_b = support_many(P, A)
    sup_s = np.array([support(P, a, use_vrep=False) for a in A])
    np.testing.assert_allclose(sup_b, sup_s, atol=1e-9)


def test_extreme_box():
    P = box(np.array([1.0, 2.0]))
    V = extreme(P)
    expected = {(1, 2), (1, -2), (-1, 2), (-1, -2)}
    got = {tuple(np.round(v).astype(int)) for v in V}
    assert got == expected
    assert V.shape == (4, 2)


def test_extreme_shifted_simplex():
    # Triangle x>=0, y>=0, x+y<=1 shifted by (5, -3)
    A = np.array([[-1.0, 0.0], [0.0, -1.0], [1.0, 1.0]])
    b = np.array([0.0, 0.0, 1.0])
    shift = np.array([5.0, -3.0])
    P = Polytope(A, b + A @ shift)
    V = extreme(P)
    expected = np.array([[0, 0], [1, 0], [0, 1]]) + shift
    assert V.shape == (3, 2)
    for e in expected:
        assert np.min(np.linalg.norm(V - e, axis=1)) < 1e-6


def test_pont_diff_boxes():
    # box(3) - box(1) = box(2) in 2D
    P = pont_diff(box(np.array([3.0, 3.0])), box(np.array([1.0, 1.0])))
    assert poly_equal(P, box(np.array([2.0, 2.0])))


def test_mink_sum_boxes():
    # box(1) + box(2) = box(3)
    S = mink_sum(box(np.array([1.0, 1.0])), box(np.array([2.0, 2.0])))
    assert poly_equal(S, box(np.array([3.0, 3.0])))


def test_mink_sum_vector_shift():
    P = box(np.array([1.0, 1.0]))
    v = np.array([0.5, -0.25])
    S = mink_sum(P, v)
    assert contains(S, v)  # center moved to v
    assert contains(S, v + np.array([1.0, 1.0]) - 1e-9)
    assert not contains(S, v + np.array([1.1, 0.0]))


def test_mink_sum_vertex_matrix():
    P = box(np.array([1.0, 1.0]))
    V2 = np.array([[2.0, 0.0], [-2.0, 0.0], [0.0, 2.0], [0.0, -2.0]])
    S = mink_sum(P, V2)  # box + diamond
    assert contains(S, np.array([3.0, 0.0]) - 1e-9)
    assert contains(S, np.array([1.0, 2.0]) - 1e-9)
    assert contains(S, np.array([3.0, 1.0]) - 1e-9)  # vertex (1,1)+(2,0)
    assert not contains(S, np.array([3.0, 2.0]))


def test_scale_scalar():
    P = box(np.array([1.0, 2.0]))
    assert poly_equal(scale(P, 2.0), box(np.array([2.0, 4.0])))
    assert poly_equal(scale(P, 1.0), P)
    # scale by 0 -> singleton at origin
    Z = scale(P, 0.0)
    assert contains(Z, np.zeros(2))
    assert not contains(Z, np.array([1e-3, 0.0]))
    # negative scale of a symmetric box is itself
    assert poly_equal(scale(P, -1.0), P)


def test_scale_matrix_rotation():
    P = box(np.array([1.0, 1.0]))
    th = np.pi / 4
    Rm = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    Q = scale(P, Rm)  # rotated square: diamond with radius sqrt(2)
    assert contains(Q, np.array([np.sqrt(2) - 1e-9, 0.0]))
    assert not contains(Q, np.array([1.0, 1.0]))


def test_scale_matrix_1d_image():
    # K Z image for 1-D input space (used in tighten_constraints)
    P = box(np.array([1.0, 1.0]))
    K = np.array([[0.5, 0.25]])
    Q = scale(P, K)
    assert Q.dim == 1
    assert support(Q, np.array([1.0])) == pytest.approx(0.75)
    assert support(Q, np.array([-1.0])) == pytest.approx(0.75)


def test_convex_hull_roundtrip():
    V = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],
                  [0.5, 0.5]])  # interior point must be dropped
    P = convex_hull(V)
    assert P.vertices.shape[0] == 4
    assert contains(P, np.array([0.5, 0.5]))
    assert not contains(P, np.array([1.1, 0.5]))


def test_reduce_removes_redundant():
    # unit box plus a slack row x1 <= 5
    A = np.vstack([np.eye(2), -np.eye(2), np.array([[1.0, 0.0]])])
    b = np.array([1.0, 1.0, 1.0, 1.0, 5.0])
    R = reduce_poly(Polytope(A, b))
    assert R.nrows == 4
    assert poly_equal(R, box(np.array([1.0, 1.0])))


def test_chebyshev_center():
    P = box(np.array([2.0, 3.0]))
    c, r = chebyshev_center(P)
    # center not unique along x2, but the inscribed radius is 2 and the
    # ball must fit: |c1| <= 0, |c2| <= 1
    assert r == pytest.approx(2.0)
    assert abs(c[0]) < 1e-8
    assert abs(c[1]) <= 1.0 + 1e-8
    assert contains(P, c)


def test_subset_and_equality():
    assert poly_subset(box(np.array([1.0, 1.0])), box(np.array([2.0, 2.0])))
    assert not poly_subset(box(np.array([2.0, 2.0])), box(np.array([1.0, 1.0])))
    assert poly_equal(intersect(box(np.array([1.0, 2.0])),
                                box(np.array([2.0, 1.0]))),
                      box(np.array([1.0, 1.0])))
