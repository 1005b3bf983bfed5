"""Runnable applications: equivalents of the reference's example & results
scripts (SURVEY.md section 2.2), re-built on the batched rollout engine.

Run as modules, e.g.::

    python -m rtmpc_tpu.apps.example_tube_tracking_lossy --platform cpu
    python -m rtmpc_tpu.apps.results_linear --platform cpu --quick

Every app prints the reference's runtime theorem checks (tube membership,
Proposition 1, constraint violations) as PASS/FAIL lines and saves figures
under ``results/`` instead of opening interactive windows.
"""
