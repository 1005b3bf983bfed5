"""Test configuration: local CPU backend, 8-device virtual mesh, float64.

The image's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers the
``axon`` remote-TPU backend at interpreter startup and pins
``JAX_PLATFORMS=axon`` — which routes every compile/execute through a
tunnel to a remote TPU host (15-90 s compile round-trips, no native f64,
and test runs wedge whenever the remote worker does).  Environment
variables set here are too late (jax is already imported by
sitecustomize), but ``jax.config.update("jax_platforms", ...)`` still
works, and XLA_FLAGS is read lazily at first backend creation.

The engine itself is dtype-parameterized (float32 on the real TPU for the
benches); tests run on local CPU with x64 so the JAX engine can be
compared against float64 NumPy oracles at tight tolerances, and so
multi-chip shardings can be exercised on a virtual 8-device mesh without
TPU hardware.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
