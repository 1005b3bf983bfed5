"""Native batched-LP kernel (native/rtmpc_lp.cpp) vs scipy/HiGHS parity.

The kernel replaces the reference's per-call scipy.linprog support LPs
(``utils_polytope.py:12-23``); these tests pin exact agreement on known
geometry, random polytopes, and the degenerate many-near-parallel-facet
H-reps produced by mRPI approximations, plus the unbounded / infeasible
status protocol.  Skipped wholesale if the toolchain is unavailable.
"""

import numpy as np
import pytest

from rtmpc_tpu.utils._native import native_available, support_batch_native
from rtmpc_tpu.utils.polytope import _support_scipy, box, support_lp_batch

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native LP kernel not built")


def test_box_support_exact():
    A = np.vstack([np.eye(3), -np.eye(3)])
    b = np.ones(6)
    C = np.random.default_rng(0).standard_normal((300, 3))
    h, st = support_batch_native(A, b, C)
    np.testing.assert_allclose(h, np.abs(C).sum(axis=1), atol=1e-12)
    assert (st == 0).all()


def test_random_polytopes_vs_scipy():
    rng = np.random.default_rng(1)
    for trial in range(20):
        n = rng.integers(2, 7)
        m = rng.integers(n + 1, 40)
        A = rng.standard_normal((m, n))
        b = rng.uniform(0.5, 3.0, m)          # contains origin
        # close the polytope with a box so every direction is bounded
        A = np.vstack([A, np.eye(n), -np.eye(n)])
        b = np.concatenate([b, 10 * np.ones(2 * n)])
        C = rng.standard_normal((25, n))
        h, st = support_batch_native(A, b, C)
        h_ref = np.array([_support_scipy(A, b, c) for c in C])
        assert (st == 0).all()
        np.testing.assert_allclose(h, h_ref, rtol=1e-9, atol=1e-10)


def test_unbounded_and_infeasible_status():
    # half-space: bounded only along +e1
    A = np.array([[1.0, 0.0]])
    b = np.array([1.0])
    h, st = support_batch_native(A, b, np.array([[1.0, 0.0], [0.0, 1.0]]))
    assert st[0] == 0 and abs(h[0] - 1.0) < 1e-12
    assert st[1] == 1 and np.isposinf(h[1])

    # empty set
    A2 = np.array([[1.0], [-1.0]])
    b2 = np.array([-1.0, -1.0])
    h2, st2 = support_batch_native(A2, b2, np.array([[1.0]]))
    assert st2[0] == 2 and np.isnan(h2[0])


def test_degenerate_mrpi_geometry_matches_scipy():
    """The failure mode that broke the first kernel version: hundreds of
    near-parallel facets from an RPI construction (tiny degenerate pivots).
    ``support_lp_batch`` must agree with scipy row-per-row (it falls back
    to scipy automatically on status-2 rows)."""
    from rtmpc_tpu.utils.synthesis import dlqr
    from rtmpc_tpu.sets.invariant import rpi_darup

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.5], [1.0]])
    K, _, _ = dlqr(A, B, np.eye(2), np.eye(1))
    W = box(np.array([0.1, 0.1]))
    X = box(np.array([10.0, 10.0]))
    U = box(np.array([3.0]))
    rpi, status = rpi_darup(A - B @ K, W, X, U, K, eps_var=1e-3, s_max=50)
    assert status == 0
    dirs = np.vstack([rpi.A, -rpi.A[::2]])
    h = support_lp_batch(rpi.A, rpi.b, dirs)
    h_ref = np.array([_support_scipy(rpi.A, rpi.b, c) for c in dirs])
    np.testing.assert_allclose(h, h_ref, rtol=1e-9, atol=1e-9)


def test_setup_identical_with_and_without_native(monkeypatch):
    """End-to-end: the tube-tracking setup produces the same sets through
    the native kernel and the scipy fallback."""
    import rtmpc_tpu.utils._native as nat
    from rtmpc_tpu.models import setup_tube_tracking
    from rtmpc_tpu.utils.polytope import poly_equal

    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    args = (A, B, np.eye(2), np.eye(1), 6, box(np.array([8.0, 8.0])),
            box(np.array([1.0])), box(np.array([0.1, 0.1])))
    s1 = setup_tube_tracking(*args, fixed_initial_state=True)

    monkeypatch.setenv("RTMPC_NO_NATIVE", "1")
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_lib", None)
    s2 = setup_tube_tracking(*args, fixed_initial_state=True)

    assert poly_equal(s1.Z, s2.Z, tol=1e-8)
    assert poly_equal(s1.Xf, s2.Xf, tol=1e-8)
    assert poly_equal(s1.Xc, s2.Xc, tol=1e-8)
    assert poly_equal(s1.Uc, s2.Uc, tol=1e-8)
