"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

The engine itself is dtype-parameterized (float32 on TPU for the benches);
tests run on CPU with x64 enabled so the JAX engine can be compared against
the float64 NumPy oracles at tight tolerances, and so multi-chip shardings
can be exercised without TPU hardware (per the task spec's virtual-mesh
testing recipe).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
