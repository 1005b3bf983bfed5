"""Atomic end-of-round evidence: run EVERYTHING on the final tree, in order,
and fail loudly on stale or empty artifacts.

Rounds 2 and 3 both shipped evidence that did not certify HEAD (the parity
gate predated the last commits; a Results log was committed empty).  This
gate institutionalizes the fix: one command produces every round artifact
from the tree as it stands, then audits that each artifact is non-empty
and newer than the last code commit.

    python tools/release_gate.py --round 4              # full (~30-40 min on TPU)
    python tools/release_gate.py --round 4 --skip tests # iterate on one stage

Stages (each tees to an artifact at the repo root):

    tests      pytest tests/ -q                          (CPU, f64 oracles)
    parity     tools/tpu_checks.py --round N             -> PARITY_TPU_r0N.json
    linear     apps.results_linear (full, TPU default=ip) -> RESULTS_LINEAR_r0N.log + .json
    linear_ext apps.results_linear_extended              -> RESULTS_LINEAR_EXT_r0N.log + .json
    nonlinear  apps.results_nonlinear (plain AND --extended)
                                                         -> RESULTS_NONLINEAR_r0N.log,
                                                            RESULTS_NONLINEAR_EXT_r0N.log (+ .json)
    compare    TPU linear rows vs the committed CPU/f64 truth JSON
               (RESULTS_LINEAR_CPU_F64_r0N.json) within 2%  [skipped if absent]
    multichip  tools/multichip_bench.py --round N        -> MULTICHIP_SCALING_r0N.json
    bench      python bench.py                           -> BENCH_GATE_r0N.json
    audit      every artifact exists, is non-empty, and postdates HEAD

The audit also fails if the working tree has uncommitted changes to
tracked source files at gate START (evidence must certify a commit).
"""

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = ["tests", "parity", "linear", "linear_ext", "nonlinear",
          "compare", "multichip", "bench", "audit"]


def run(cmd, log_path=None, env=None):
    """Run a subprocess, teeing combined output to ``log_path``."""
    print(f"\n=== $ {' '.join(cmd)}" + (f"  (tee {log_path})" if log_path
                                        else ""))
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=_ROOT, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    lines = []
    log_f = open(log_path, "w") if log_path else None
    try:
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            if log_f:
                log_f.write(line)
                log_f.flush()
            lines.append(line)
        proc.wait()
    finally:
        if log_f:
            log_f.close()
    print(f"=== exit {proc.returncode} in {time.time() - t0:.0f}s")
    return proc.returncode, "".join(lines)


def head_commit_time() -> float:
    out = subprocess.check_output(
        ["git", "log", "-1", "--format=%ct"], cwd=_ROOT, text=True)
    return float(out.strip())


def tree_dirty() -> str:
    out = subprocess.check_output(
        ["git", "status", "--porcelain", "--untracked-files=no"],
        cwd=_ROOT, text=True)
    # artifacts the gate itself (re)writes are fine; source files are not
    dirty = [ln for ln in out.splitlines()
             if ln[3:].split(" ->")[0].endswith((".py", ".cpp", ".md"))
             and not ln[3:].startswith(("PARITY", "RESULTS", "BENCH",
                                        "MULTICHIP", "SERVE", "ADMM"))]
    return "\n".join(dirty)


def compare_linear(tpu_json: str, truth_json: str, tol: float = 0.02):
    """Per-p RMS rows of the TPU run vs the committed f64 truth.

    Gated statistics (draws are PAIRED across backends since the f32 RNG
    pin):
    * tube arm: mean AND median within ``tol`` — the robust controller's
      closed loop is contractive, so f32-vs-f64 must agree tightly;
    * track arm: MEDIAN within ``tol`` — the non-robust arm at high loss
      sits on a knife edge where one MC run can qualitatively diverge
      (saturation/instability), an event f32-vs-f64 rounding legitimately
      flips; its *mean* is dominated by whether that run blew up (the
      reference itself reports this arm as boxplots for the same reason,
      ``results_linear_system.py:341-396``), so the mean is printed but
      not gated.
    """
    with open(tpu_json) as f:
        tpu = json.load(f)
    with open(truth_json) as f:
        cpu = json.load(f)
    if tpu["n_mc"] != cpu["n_mc"] or tpu["T"] != cpu["T"] \
            or tpu["seed"] != cpu["seed"]:
        return False, (f"config mismatch: tpu n_mc={tpu['n_mc']} T={tpu['T']}"
                       f" seed={tpu['seed']} vs truth n_mc={cpu['n_mc']} "
                       f"T={cpu['T']} seed={cpu['seed']}")
    gated = ("rms_tube", "rms_tube_median", "rms_track_median")
    msgs, ok = [], True
    for rt, rc in zip(tpu["rows"], cpu["rows"]):
        assert rt["p"] == rc["p"]
        for k in ("rms_tube", "rms_tube_median", "rms_track",
                  "rms_track_median"):
            if k not in rt or k not in rc:
                continue
            a, b = rt[k], rc[k]
            if b != b:      # NaN truth row (arm stopped): skip
                continue
            rel = abs(a - b) / abs(b)
            if k in gated:
                flag = "OK " if rel <= tol else "FAIL"
                if rel > tol:
                    ok = False
            else:
                flag = "info" if rel > tol else "ok  "
            msgs.append(f"  p={rt['p']:.1f} {k}: tpu {a:.5f} vs f64 "
                        f"{b:.5f}  rel {rel:.4f} [{flag}]")
        # track-arm FULL-distribution gate (round-5 ask #3): instead of
        # dropping the knife-edge-sensitive mean, gate the KS distance of
        # the 20-run RMS distributions — a single divergent paired run
        # (the dissected p=0.8 saturation event, KNIFE_EDGE_r05.json)
        # moves KS by exactly 1/n and passes; a systematic shift fails.
        if "rms_track_all" in rt and "rms_track_all" in rc:
            import numpy as _np
            av = _np.sort(_np.asarray(rt["rms_track_all"], float))
            bv = _np.sort(_np.asarray(rc["rms_track_all"], float))
            allv = _np.concatenate([av, bv])
            cdf = lambda v, x: _np.searchsorted(v, x, side="right") / len(v)
            ks = float(_np.max(_np.abs(cdf(av, allv) - cdf(bv, allv))))
            ks_tol = 0.2        # <= 4 of 20 runs rank-shifted
            flag = "OK " if ks <= ks_tol else "FAIL"
            if ks > ks_tol:
                ok = False
            msgs.append(f"  p={rt['p']:.1f} rms_track KS distance: "
                        f"{ks:.3f} (tol {ks_tol}) [{flag}]")
    return ok, "\n".join(msgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip", nargs="*", default=[], choices=STAGES,
                    help="stages to skip (iteration only — a round "
                         "artifact set needs all of them)")
    ap.add_argument("--n-mc", type=int, default=20)
    args = ap.parse_args()
    rr = f"r{args.round:02d}"
    py = sys.executable
    t_head = head_commit_time()
    failures = []

    dirty = tree_dirty()
    if dirty:
        print("FATAL: uncommitted source changes — evidence must certify "
              "a commit:\n" + dirty)
        return 2

    expected = []       # (path, human name)

    def stage(name):
        on = name not in args.skip
        print(f"\n######## stage {name}: {'RUN' if on else 'SKIP'}")
        return on

    if stage("tests"):
        rc, _ = run([py, "-m", "pytest", "tests/", "-q"])
        if rc != 0:
            failures.append("tests")

    if stage("parity"):
        rc, _ = run([py, "tools/tpu_checks.py", "--round",
                     str(args.round)])
        if rc != 0:
            failures.append("parity")
    expected.append((f"PARITY_TPU_{rr}.json", "hardware parity gate"))

    if stage("linear"):
        rc, _ = run([py, "-m", "rtmpc_tpu.apps.results_linear",
                     "--n-mc", str(args.n_mc),
                     "--save-json", f"RESULTS_LINEAR_{rr}.json"],
                    log_path=os.path.join(_ROOT, f"RESULTS_LINEAR_{rr}.log"))
        if rc != 0:
            failures.append("linear")
    expected += [(f"RESULTS_LINEAR_{rr}.log", "linear sweep log"),
                 (f"RESULTS_LINEAR_{rr}.json", "linear sweep rows")]

    if stage("linear_ext"):
        rc, _ = run([py, "-m", "rtmpc_tpu.apps.results_linear_extended",
                     "--n-mc", str(args.n_mc),
                     "--save-json", f"RESULTS_LINEAR_EXT_{rr}.json"],
                    log_path=os.path.join(_ROOT,
                                          f"RESULTS_LINEAR_EXT_{rr}.log"))
        if rc != 0:
            failures.append("linear_ext")
    expected.append((f"RESULTS_LINEAR_EXT_{rr}.log", "extended linear log"))

    if stage("nonlinear"):
        rc, _ = run([py, "-m", "rtmpc_tpu.apps.results_nonlinear",
                     "--n-mc", str(args.n_mc),
                     "--save-json", f"RESULTS_NONLINEAR_{rr}.json"],
                    log_path=os.path.join(_ROOT,
                                          f"RESULTS_NONLINEAR_{rr}.log"))
        if rc != 0:
            failures.append("nonlinear")
        rc, _ = run([py, "-m", "rtmpc_tpu.apps.results_nonlinear",
                     "--extended", "--n-mc", str(args.n_mc),
                     "--save-json", f"RESULTS_NONLINEAR_EXT_{rr}.json"],
                    log_path=os.path.join(
                        _ROOT, f"RESULTS_NONLINEAR_EXT_{rr}.log"))
        if rc != 0:
            failures.append("nonlinear_ext")
    expected += [(f"RESULTS_NONLINEAR_{rr}.log", "nonlinear log"),
                 (f"RESULTS_NONLINEAR_EXT_{rr}.log", "nonlinear ext log")]

    if stage("compare"):
        truth = os.path.join(_ROOT, f"RESULTS_LINEAR_CPU_F64_{rr}.json")
        if not os.path.exists(truth):
            # fall back to the newest committed truth: the f64-CPU rows
            # are a function of (code semantics, seeds) only, and
            # compare_linear still verifies the config fields match
            import glob
            cands = sorted(glob.glob(
                os.path.join(_ROOT, "RESULTS_LINEAR_CPU_F64_r*.json")))
            if cands:
                truth = cands[-1]
                print(f"compare: using fallback truth {truth}")
        tpu_j = os.path.join(_ROOT, f"RESULTS_LINEAR_{rr}.json")
        if os.path.exists(truth) and os.path.exists(tpu_j):
            ok, msg = compare_linear(tpu_j, truth)
            print(f"\n=== TPU vs f64-truth per-p mean-RMS comparison "
                  f"(tol 2%):\n{msg}")
            if not ok:
                failures.append("compare")
        else:
            print(f"compare: SKIPPED — missing {truth} (run "
                  f"apps.results_linear --platform cpu --save-json "
                  f"{truth} once to record the truth)")

    if stage("multichip"):
        env = dict(os.environ)
        rc, _ = run([py, "tools/multichip_bench.py", "--round",
                     str(args.round)], env=env)
        if rc != 0:
            failures.append("multichip")
    expected.append((f"MULTICHIP_SCALING_{rr}.json",
                     "virtual-mesh scaling"))

    if stage("bench"):
        rc, out = run([py, "bench.py"])
        if rc != 0:
            failures.append("bench")
        else:
            last = [ln for ln in out.splitlines() if ln.startswith("{")]
            if last:
                with open(os.path.join(_ROOT, f"BENCH_GATE_{rr}.json"),
                          "w") as f:
                    f.write(last[-1] + "\n")
    expected.append((f"BENCH_GATE_{rr}.json", "gate bench record"))

    if stage("audit"):
        print("\n######## audit: artifact freshness vs HEAD "
              f"({time.strftime('%F %T', time.localtime(t_head))})")
        for fname, desc in expected:
            path = os.path.join(_ROOT, fname)
            if not os.path.exists(path):
                print(f"  MISSING  {fname} ({desc})")
                failures.append(f"audit:{fname}")
                continue
            size = os.path.getsize(path)
            mtime = os.path.getmtime(path)
            fresh = mtime >= t_head
            empty = size == 0
            mark = "ok   " if (fresh and not empty) else "STALE" \
                if not fresh else "EMPTY"
            print(f"  {mark}  {fname}  {size:>8d} B  "
                  f"{time.strftime('%F %T', time.localtime(mtime))}")
            if empty:
                failures.append(f"audit:{fname}:empty")
            if not fresh:
                failures.append(f"audit:{fname}:stale")

    print("\n######## release gate:",
          "PASS — commit the artifacts" if not failures
          else f"FAIL — {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
