"""Smoke test for the animation app (round-5 ask #8).

``create_animations`` was the only §2.2 deliverable with neither a test
nor a committed artifact (reference: ``Results/create_animations.py:
414-419`` + ``cartpole.py:48-79``).  Runs the app quick on CPU and checks
both GIFs and both strip PNGs exist and are non-trivial.
"""

import os

import pytest


@pytest.mark.slow
def test_create_animations_quick(tmp_path):
    from rtmpc_tpu.apps import create_animations
    from rtmpc_tpu.apps.common import RESULTS_DIR
    rc = create_animations.main([
        "--quick", "--platform", "cpu", "--strip-dir", str(tmp_path)])
    assert rc == 0
    for arm in ("tube", "track"):
        gif = os.path.join(RESULTS_DIR, f"animation_{arm}_p0.4.gif")
        assert os.path.exists(gif) and os.path.getsize(gif) > 10_000, gif
        strip = tmp_path / f"animation_{arm}_p0.4_strip.png"
        assert strip.exists() and strip.stat().st_size > 10_000, strip
