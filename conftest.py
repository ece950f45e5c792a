"""Repo-root pytest config: force CPU JAX with an 8-device virtual mesh.

Must run before any test module imports jax. Benchmarks (bench.py) and the
graft entry do NOT import this, so they still see the real TPU.
"""

import os
import sys

# Force-override: the ambient environment pins JAX_PLATFORMS to the tunneled
# TPU ("axon") and pre-imports jax at interpreter startup, so the env var
# alone is too late -- use jax.config. Tests must run on the virtual CPU mesh
# (and f64 golden tests need real float64, which the TPU backend downcasts).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
