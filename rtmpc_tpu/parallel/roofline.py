"""Roofline / MFU accounting for the batched ADMM rollout engine.

The reference has no performance model at all (its cost is "one Clarabel
solve per step", ``TrackingMPC.py:51-55``); the TPU engine's cost is
exactly computable from the problem geometry, so the bench reports where
the measured throughput sits against the hardware's compute and memory
roofs — and *which* resource binds.

Cost model (per ADMM iteration, per batch element; ``ops/qp.py:_admm_body``):

    rhs = sigma x - q + As'(rho z - y)     (B,m)x(m,n) matmul
    xt  = Kinv rhs                         (B,n)x(n,n)
    zt  = As xt                            (B,n)x(n,m)
    + elementwise over-relaxation/clip/dual update

Three GEMMs of 2*B*(2mn + n^2) FLOPs.  On the MXU each GEMM's contraction
and output dims pad to 128 lanes, so the *achievable* fraction of peak for
this op mix is itself < 1 — ``padded_tile_ceiling`` computes it; measured
MFU at ~that ceiling means the engine is MXU-padding-bound (small-matrix
lane waste), not HBM- or FLOP-bound, and the lever is layout, not fusion.

Peaks default to TPU v5e (1 chip): 197 TFLOP/s bf16 MXU peak, 819 GB/s
HBM; f32 matmuls at HIGH precision run as 3-pass bf16, so their
effective compute roof is peak/3.  Override with env
RTMPC_PEAK_BF16_TFLOPS / RTMPC_HBM_GBPS for other chips.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

__all__ = ["DevicePeaks", "device_peaks", "admm_engine_model",
           "padded_tile_ceiling", "roofline_summary"]

_LANE = 128     # MXU lane width (last dim)
_SUBLANE = 8    # f32 sublane granularity (second-to-last dim)


class DevicePeaks(NamedTuple):
    name: str
    bf16_tflops: float        # MXU peak, bf16 multiply / f32 accumulate
    f32_high_tflops: float    # effective peak for HIGH (3-pass bf16) f32
    hbm_gbps: float


_KNOWN = {
    # chip -> (bf16 peak TFLOP/s, HBM GB/s); per-chip, public figures
    "v5e": (197.0, 819.0),
    "v5 lite": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6e": (918.0, 1640.0),
}


def device_peaks(device=None) -> DevicePeaks:
    """Peak numbers for the visible chip (env-overridable)."""
    name = "v5e"
    if device is not None:
        d = str(getattr(device, "device_kind", "") or device).lower()
        for k in _KNOWN:
            if k in d:
                name = k
                break
    bf16, hbm = _KNOWN[name]
    bf16 = float(os.environ.get("RTMPC_PEAK_BF16_TFLOPS", bf16))
    hbm = float(os.environ.get("RTMPC_HBM_GBPS", hbm))
    return DevicePeaks(name=name, bf16_tflops=bf16,
                       f32_high_tflops=bf16 / 3.0, hbm_gbps=hbm)


def _pad(v: int, g: int) -> int:
    return ((v + g - 1) // g) * g


def padded_tile_ceiling(n: int, m: int) -> float:
    """Fraction of MXU peak attainable by the three iteration GEMMs given
    lane/sublane padding (batch in the M position — the vmapped layout).

    useful MACs / padded MACs over the GEMM triple
    (K=m,N=n), (K=n,N=n), (K=n,N=m); M=B streams (no waste for large B).
    """
    useful = m * n + n * n + n * m
    padded = (_pad(m, _LANE) * _pad(n, _LANE)
              + _pad(n, _LANE) * _pad(n, _LANE)
              + _pad(n, _LANE) * _pad(m, _LANE))
    return useful / padded


def admm_engine_model(n: int, m: int, ntheta: int, iters_total: int,
                      T: int, batch: int) -> dict:
    """FLOPs and HBM-byte estimates for one full batched rollout
    (T protocol steps, ``iters_total`` ADMM iterations per step).

    Two traffic scenarios bound reality from both sides:
    * ``bytes_state_resident``: loop state lives in VMEM across
      iterations; HBM carries only per-solve parameter/IO traffic.
    * ``bytes_state_streamed``: x/y/z (+ the three intermediates) round-
      trip HBM every iteration — the worst case when the batch state
      exceeds VMEM.
    """
    mm_iter = 2 * batch * (2 * m * n + n * n)            # the GEMM triple
    vpu_iter = 10 * batch * (n + 3 * m)                  # elementwise (VPU)
    # per solve: q/l/u parameter maps + final residuals
    mm_solve = 2 * batch * (n + 2 * m) * ntheta \
        + 2 * batch * (2 * m * n + n * n)
    flops_mm = T * (iters_total * mm_iter + mm_solve)
    flops = flops_mm + T * iters_total * vpu_iter

    state_bytes = 4 * batch * (n + 2 * m)
    interm_bytes = 4 * batch * (2 * n + m)
    per_iter_streamed = 2 * state_bytes + 2 * interm_bytes
    weights = 4 * (n * n + 2 * m * n)                    # Kinv + As (+As')
    bytes_streamed = T * (iters_total * (per_iter_streamed + weights)
                          + 2 * state_bytes)
    bytes_resident = T * (iters_total * weights + 4 * state_bytes)
    return {
        "n": n, "m": m, "ntheta": ntheta, "iters_total": iters_total,
        "T": T, "batch": batch,
        "flops": float(flops),
        "flops_matmul": float(flops_mm),
        "bytes_state_streamed": float(bytes_streamed),
        "bytes_state_resident": float(bytes_resident),
        "padded_tile_ceiling": padded_tile_ceiling(n, m),
    }


def roofline_summary(model: dict, wall_s: float, peaks: DevicePeaks) -> dict:
    """Achieved rates vs roofs + the name of the binding resource.

    ``mfu``: achieved FLOP/s over the bf16 MXU peak (the standard
    definition).  ``mfu_f32_high``: over the effective 3-pass-f32 peak
    (what HIGH-precision matmuls can actually reach).  The binding
    resource is called by comparing each resource's utilization of its
    roof, including the padded-tile ceiling (useful-MAC fraction the MXU
    can deliver on these small matrices).
    """
    achieved_fs = model["flops"] / wall_s
    achieved_mm = model["flops_matmul"] / wall_s
    mfu = achieved_mm / (peaks.bf16_tflops * 1e12)
    mfu_f32 = achieved_mm / (peaks.f32_high_tflops * 1e12)
    hbm_streamed = model["bytes_state_streamed"] / wall_s / (
        peaks.hbm_gbps * 1e9)
    hbm_resident = model["bytes_state_resident"] / wall_s / (
        peaks.hbm_gbps * 1e9)
    ceiling = model["padded_tile_ceiling"]
    # utilization of the PADDING-ADJUSTED compute roof
    mxu_util = mfu_f32 / ceiling
    # a streamed-state HBM utilization > 1 is infeasible — it *proves* the
    # loop state is VMEM-resident, so only the resident scenario competes
    candidates = {"mxu_padded_tiles": mxu_util}
    if hbm_streamed < 1.0:
        candidates["hbm_if_streamed"] = hbm_streamed
    else:
        candidates["hbm_resident"] = hbm_resident
    bound = max(candidates, key=candidates.get)
    return {
        "achieved_tflops": round(achieved_fs / 1e12, 3),
        "achieved_matmul_tflops": round(achieved_mm / 1e12, 3),
        "mfu": round(mfu, 4),
        "mfu_f32_high": round(mfu_f32, 4),
        "padded_tile_ceiling": round(ceiling, 4),
        "mxu_padded_util": round(mxu_util, 4),
        "hbm_util_if_streamed": round(hbm_streamed, 4),
        "hbm_util_if_resident": round(hbm_resident, 4),
        "roofline_bound": bound,
        "peaks": {"chip": peaks.name,
                  "bf16_tflops": peaks.bf16_tflops,
                  "f32_high_tflops": round(peaks.f32_high_tflops, 1),
                  "hbm_gbps": peaks.hbm_gbps},
    }
