"""Unit tests: roofline accounting + release-gate row comparison +
serve-app smoke run (the round-4 evidence plumbing)."""

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

from rtmpc_tpu.parallel.roofline import (admm_engine_model, device_peaks,
                                         padded_tile_ceiling,
                                         roofline_summary)


def test_padded_tile_ceiling_flagship_geometry():
    # n_p=40, m_p=112 (the flagship spec): useful MACs 10560 of 3 full
    # 128x128 tiles
    c = padded_tile_ceiling(40, 112)
    assert abs(c - 10560 / 49152) < 1e-12
    # full tiles hit the roof exactly
    assert padded_tile_ceiling(128, 128) == 1.0


def test_engine_model_consistency():
    m = admm_engine_model(n=40, m=112, ntheta=4, iters_total=120,
                          T=120, batch=16384)
    assert m["flops_matmul"] <= m["flops"]
    # matmul FLOPs: T * (iters * 2B(2mn+n^2) + per-solve terms)
    per_iter = 2 * 16384 * (2 * 112 * 40 + 40 * 40)
    assert m["flops_matmul"] > 120 * 120 * per_iter
    assert m["bytes_state_resident"] < m["bytes_state_streamed"]


def test_roofline_bound_naming():
    peaks = device_peaks()
    m = admm_engine_model(40, 112, 4, 120, 120, 16384)
    # measured regime (round 4): ~0.34 s/rollout-batch -> streamed-HBM
    # infeasible (>1), so the bound must be the padded-tile MXU ceiling
    s = roofline_summary(m, wall_s=0.34, peaks=peaks)
    assert s["hbm_util_if_streamed"] > 1.0
    assert s["roofline_bound"] == "mxu_padded_tiles"
    assert 0.5 < s["mxu_padded_util"] < 2.0
    # absurdly fast wall time still names compute, never negative rates
    s2 = roofline_summary(m, wall_s=1000.0, peaks=peaks)
    assert s2["roofline_bound"] in ("mxu_padded_tiles", "hbm_if_streamed")
    assert s2["mfu"] >= 0.0


def test_release_gate_compare_rows(tmp_path):
    from release_gate import compare_linear

    rows_cpu = [{"p": 0.1 * i, "rms_tube": 0.02 + 0.001 * i,
                 "rms_track": 0.03 + 0.002 * i,
                 "rms_tube_median": 0.019 + 0.001 * i,
                 "rms_track_median": 0.029 + 0.002 * i,
                 "track_infeasible": 0}
                for i in range(10)]
    base = {"n_mc": 20, "T": 250, "seed": 0, "rows": rows_cpu}
    cpu = tmp_path / "cpu.json"
    cpu.write_text(json.dumps(base))

    # within 2% on gated stats: passes
    rows_tpu = [dict(r, rms_tube=r["rms_tube"] * 1.015,
                     rms_track=r["rms_track"] * 0.99) for r in rows_cpu]
    tpu = tmp_path / "tpu.json"
    tpu.write_text(json.dumps(dict(base, rows=rows_tpu)))
    ok, msg = compare_linear(str(tpu), str(cpu))
    assert ok, msg

    # the track MEAN is informational, not gated (knife-edge outlier runs)
    rows_meanoff = [dict(r) for r in rows_tpu]
    rows_meanoff[8]["rms_track"] = rows_cpu[8]["rms_track"] * 2.5
    tpu.write_text(json.dumps(dict(base, rows=rows_meanoff)))
    ok, msg = compare_linear(str(tpu), str(cpu))
    assert ok and "info" in msg

    # but the track MEDIAN is gated
    rows_medoff = [dict(r) for r in rows_tpu]
    rows_medoff[8]["rms_track_median"] = \
        rows_cpu[8]["rms_track_median"] * 1.1
    tpu.write_text(json.dumps(dict(base, rows=rows_medoff)))
    ok, msg = compare_linear(str(tpu), str(cpu))
    assert not ok

    # 5% off on one row: fails
    rows_bad = [dict(r) for r in rows_tpu]
    rows_bad[3]["rms_tube"] = rows_cpu[3]["rms_tube"] * 1.05
    tpu.write_text(json.dumps(dict(base, rows=rows_bad)))
    ok, msg = compare_linear(str(tpu), str(cpu))
    assert not ok and "FAIL" in msg

    # NaN truth rows (stopped arm) are skipped, not compared
    rows_nan = [dict(r, rms_track=float("nan")) for r in rows_cpu]
    cpu.write_text(json.dumps(dict(base, rows=rows_nan)))
    tpu.write_text(json.dumps(dict(base, rows=rows_tpu)))
    ok, _ = compare_linear(str(tpu), str(cpu))
    assert ok

    # config mismatch is a hard failure
    cpu.write_text(json.dumps(dict(base, n_mc=5)))
    ok, msg = compare_linear(str(tpu), str(cpu))
    assert not ok and "mismatch" in msg


def test_serve_controller_smoke(capsys):
    """The deployment demo runs end-to-end (tiny session, CPU)."""
    from rtmpc_tpu.apps.serve_controller import main

    rc = main(["--ticks", "300", "--window", "150",
               "--per-dispatch-ticks", "10"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "device-resident session" in out
    assert out.count("[PASS]") == 4
