"""Shared plumbing for the runnable apps."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

RESULTS_DIR = os.environ.get(
    "RTMPC_RESULTS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "results"))


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. 'cpu'); default uses "
                        "the environment (TPU under the axon image)")
    p.add_argument("--quick", action="store_true",
                   help="shrink the workload for smoke runs")
    p.add_argument("--no-figures", action="store_true",
                   help="skip matplotlib figure generation")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "float64"],
                   help="engine dtype; default float64 on CPU, float32 on "
                        "TPU (TPU has no f64 linear-algebra kernels)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--solver", default=None,
                   choices=["ip", "admm", "pallas"],
                   help="QP solver: default 'ip' on CPU (f64 "
                        "interior-point, Clarabel-class) and 'admm' with "
                        "KKT polish on TPU (the IP path's per-iteration "
                        "LU factorizations compile for minutes on TPU; "
                        "ADMM+polish compiles in seconds at ~1e-4 f32 "
                        "solution accuracy); 'pallas' routes batched "
                        "sweeps through the fused VMEM-resident kernel")
    return p


def init_jax(args):
    """Apply the platform override BEFORE any computation.

    Env vars are not enough on this image (sitecustomize pre-imports jax),
    hence the config update.  float64 requires the CPU backend.
    """
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype is None:
        args.dtype = ("float64" if jax.default_backend() == "cpu"
                      else "float32")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    if args.solver is None:
        args.solver = "ip" if jax.default_backend() == "cpu" else "admm"
    return jax


def solver_kwargs(args, ip_iters: int = 30, admm_iters: int = 120):
    """``to_device`` solver arguments for the parsed app flags.

    The ADMM path runs the round-3 two-phase rho schedule (60+60,
    alpha=1.8, rho2=rho*0.2) validated on hardware by tools/tpu_checks.py
    — 1.7e-4 flagship trajectory parity at ~2.3x the round-2 fixed-400
    throughput (ACCURACY.md).  NO polish on TPU f32: measured, the f32
    LU-based polish never improves the iterate and costs ~1000x; polish
    stays on for the f64 CPU path, where it reaches 1e-8-class KKT
    residuals.  ``--solver ip`` is the accuracy mode (Clarabel-class on
    f64 CPU; Ruiz-scaled f32 on TPU).
    """
    if args.solver == "ip":
        return dict(solver="ip", ip_iters=ip_iters, polish=True)
    sched = dict(solver=args.solver, iters=admm_iters // 2,
                 iters2=admm_iters - admm_iters // 2, alpha=1.8,
                 rho2_scale=0.2)
    sched["polish"] = args.dtype == "float64"
    return sched


def check_tol(args) -> float:
    """Constraint/invariant check tolerance for the active solver mode.

    Accuracy mode (f64 interior point, the reference-parity path asserted
    in tests) holds invariants to 1e-6 like the reference's Clarabel at
    tol 1e-7; the f32 ADMM+polish throughput mode satisfies them to
    solver tolerance (~1e-3 absolute on unit-scale constraints)."""
    return 1e-6 if (args.solver == "ip" and args.dtype == "float64") \
        else 2.5e-3


def savefig(fig, name: str, enabled: bool = True):
    if not enabled:
        return None
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, name)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print(f"[figure] {path}")
    return path


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" +
          (f" — {detail}" if detail else ""))
    return bool(ok)


# solve-time reporting lives in rtmpc_tpu.parallel.latency: real per-step
# measurements (measure_step_latencies) + the reference's quantile/histogram
# report (latency_report) — no synthesized statistics.
