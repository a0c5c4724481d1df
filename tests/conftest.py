"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

Mirrors SURVEY.md section 4's recommendation: multi-host/SPMD code paths are
validated on `--xla_force_host_platform_device_count=8` fake devices; the
real-TPU path is exercised by bench.py and the driver's compile checks.

Must set env vars BEFORE jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-registers the TPU platform and sets
# jax_platforms="axon,cpu" at interpreter start; env vars alone cannot
# override it, so pin the CPU backend via jax.config before any backend
# initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
