"""Per-step latency measurement correctness: the chained single-dispatch
loop of ``measure_step_latencies`` must trace the SAME closed loop as the
scanned engine (only timing granularity differs), and ``latency_report``
must reproduce the reference's quantile/histogram semantics
(``results_linear_system.py:304-320``)."""

import numpy as np
import jax
import jax.numpy as jnp

from rtmpc_tpu.utils import box
from rtmpc_tpu.models import setup_tube_tracking
from rtmpc_tpu.parallel.rollout import make_rollout_fn, init_carry
from rtmpc_tpu.parallel.latency import (latency_report,
                                        measure_step_latencies)


def _flagship(iters=40):
    A = np.array([[1.0, 1.0], [0.0, 1.0]])
    B = np.array([[0.0], [1.0]])
    setup = setup_tube_tracking(
        A, B, np.eye(2), np.eye(1), 10,
        box(np.array([8.0, 8.0])), box(np.array([1.0])),
        box(np.array([0.1, 0.1])), fixed_initial_state=True)
    return setup.to_device(dtype=jnp.float64, iters=iters)


def test_chained_steps_match_scan():
    arrays, cfg = _flagship()
    T = 12
    rng = np.random.default_rng(0)
    refs = np.zeros((T, 2))
    refs[:, 0] = 4.0
    w = rng.uniform(-0.1, 0.1, (T, 2))
    theta = (rng.uniform(size=T) >= 0.5).astype(np.int64)
    gamma = (rng.uniform(size=T) >= 0.5).astype(np.int64)
    theta[0] = gamma[0] = 1
    x0 = np.zeros(2)

    scan_fn = jax.jit(make_rollout_fn(arrays, cfg, T))
    _, outs = scan_fn(jnp.asarray(x0), jnp.asarray(refs), jnp.asarray(w),
                      jnp.asarray(theta, jnp.int32),
                      jnp.asarray(gamma, jnp.int32))
    xs_scan = np.asarray(outs.x)

    # re-run step by step, capturing the trajectory through the carry
    step1 = jax.jit(make_rollout_fn(arrays, cfg, 1))
    carry = init_carry(arrays, cfg, jnp.asarray(x0), T)
    xs = []
    for t in range(T):
        carry, o = step1(jnp.asarray(x0),
                         jnp.asarray(refs[t:t + 1]),
                         jnp.asarray(w[t:t + 1]),
                         jnp.asarray(theta[t:t + 1], jnp.int32),
                         jnp.asarray(gamma[t:t + 1], jnp.int32), carry)
        xs.append(np.asarray(o.x[0]))
    np.testing.assert_allclose(np.array(xs), xs_scan, atol=1e-12,
                               err_msg="chained single-step loop diverges "
                                       "from the scanned engine")

    # the measurement helper runs the same loop and returns T wall times
    times = measure_step_latencies(arrays, cfg, refs, w, theta, gamma)
    assert times.shape == (T,) and np.all(times > 0)


def test_latency_report_quantiles():
    ms = np.array([1.0, 2.0, 3.0, 4.0, 100.0]) * 1e-3
    stats = latency_report(ms, budget_ms=20.0)
    assert stats["max_ms"] == 100.0
    assert stats["median_ms"] == 3.0
    assert stats["n_solves"] == 5
    assert sum(stats["hist_counts"]) == 5      # clipped into 2.5..20 bins
