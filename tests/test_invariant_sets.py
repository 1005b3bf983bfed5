"""Tests for mRPI / RPI / maximal-admissible-set algorithms.

Key oracles (SURVEY.md section 4):
* Darup k_star known answers: eps 1e-1/1e-2/1e-3 -> k* = 5/6/10 for the
  double integrator with B=[[0.5],[1]] and its LQR gain
  (reference ``Example of Approximation of mRPI_Darup.py:50-55``).
* Invariance checked directly: A Z + W inside Z (up to the eps inflation).
* Gilbert-Tan fixed point checked by definition: O_inf invariant and inside X.
"""

import numpy as np
import pytest

from rtmpc_tpu.utils.polytope import (
    Polytope, box, contains, mink_sum, poly_subset, scale, support_many,
)
from rtmpc_tpu.utils.synthesis import dlqr
from rtmpc_tpu.sets.invariant import (
    determine_mrpi, max_admissible_set, mrpi_rakovic, rpi_darup,
    tighten_constraints,
)


@pytest.fixture(scope="module")
def darup_setup():
    """The configuration of 'Example of Approximation of mRPI_Darup.py'."""
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.5], [1.0]])
    W = box(np.array([0.1, 0.1]))
    X = Polytope(np.vstack([np.eye(2), -np.eye(2)]),
                 np.array([4.0, 2.0, 8.0, 4.0]))
    U = box(np.array([1.0]))
    K, _, _ = dlqr(A, B, np.eye(2), np.eye(1))
    Acl = A - B @ K
    return A, B, W, X, U, K, Acl


@pytest.mark.parametrize("eps,kstar", [(1e-1, 5), (1e-2, 6), (1e-3, 10)])
def test_darup_known_kstar(darup_setup, eps, kstar):
    _, _, W, X, U, K, Acl = darup_setup
    rpi, status = rpi_darup(Acl, W, X, U, K, eps_var=eps, s_max=50)
    assert status == 0
    assert rpi._k_star == kstar


def test_darup_rpi_is_invariant(darup_setup):
    _, _, W, X, U, K, Acl = darup_setup
    rpi, status = rpi_darup(Acl, W, X, U, K, eps_var=1e-3, s_max=50)
    assert status == 0
    # invariance: h_{Acl Z + W}(a) <= h_Z(a) for all rows a of Z
    Vz = rpi.get_vertices()
    AZ_plus_W = mink_sum(Polytope(rpi.A, rpi.b,
                                  vertices=Vz @ Acl.T), W)
    assert poly_subset(AZ_plus_W, rpi, tol=1e-6)


def test_rakovic_mrpi_invariant():
    # Rakovic Fig.1 config: double integrator with K=[1.17, 1.03]
    # (reference 'Example of Approximation of mRPI_Rakovic.py:14-37')
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[1.0], [1.0]])
    K = np.array([[1.17, 1.03]])
    Acl = A - B @ K
    W = box(np.array([1.0, 1.0]))
    Z, status = mrpi_rakovic(Acl, W, eps_var=1.9e-5, s_max=40)
    assert status == 0
    AZ_plus_W = mink_sum(scale(Z, Acl), W)
    # Z is an outer eps-approx of the mRPI; invariance holds within tol
    assert poly_subset(AZ_plus_W, Z, tol=1e-3)


def test_rakovic_vs_darup_consistency(darup_setup):
    """Both algorithms approximate the same mRPI: supports must be close."""
    _, _, W, X, U, K, Acl = darup_setup
    Zr, s0 = mrpi_rakovic(Acl, W, eps_var=1e-5, s_max=60)
    Zd, s1 = rpi_darup(Acl, W, X, U, K, eps_var=1e-4, s_max=60)
    assert s0 == 0 and s1 == 0
    dirs = np.vstack([np.eye(2), -np.eye(2),
                      [[1, 1], [1, -1], [-1, 1], [-1, -1]]])
    sup_r = support_many(Zr, dirs, force_vertices=True)
    sup_d = support_many(Zd, dirs, force_vertices=True)
    np.testing.assert_allclose(sup_r, sup_d, rtol=2e-3, atol=2e-3)


def test_max_admissible_set_double_integrator():
    # x+ = Acl x with LQR closed loop; X = state box + input constraint rows
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    K, _, _ = dlqr(A, B, np.eye(2), np.eye(1))
    Acl = A - B @ K
    X = box(np.array([5.0, 5.0]))
    U = box(np.array([1.0]))
    XU = Polytope(np.vstack([X.A, -U.A @ K]),
                  np.concatenate([X.b, U.b]))
    Oinf = max_admissible_set(Acl, XU)
    # O_inf subset of XU and invariant: Acl O_inf subset of O_inf
    assert poly_subset(Oinf, XU, tol=1e-7)
    AO = scale(Oinf, Acl)
    assert poly_subset(AO, Oinf, tol=1e-6)
    # sanity: contains a neighborhood of the origin
    assert contains(Oinf, np.zeros(2))
    assert contains(Oinf, np.array([0.1, 0.0]))


def test_tighten_constraints(darup_setup):
    _, _, W, X, U, K, Acl = darup_setup
    Z = determine_mrpi(Acl, W, X, U, K, eps_var=1e-4, rpi_method=1)
    Xc, Uc = tighten_constraints(X, U, Z, K)
    # tightened sets are strict subsets
    assert poly_subset(Xc, X)
    assert poly_subset(Uc, U)
    # tightening amounts equal support values of Z / -KZ
    sup_z = support_many(Z, X.A, force_vertices=True)
    np.testing.assert_allclose(Xc.b, X.b - sup_z, atol=1e-9)


def test_determine_mrpi_rejects_unstable():
    with pytest.raises(ValueError):
        determine_mrpi(np.array([[1.1, 0.0], [0.0, 0.5]]),
                       box(np.array([0.1, 0.1])))
