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

# Persistent XLA compilation cache (repo-local, gitignored): the suite is
# compile-bound -- the interpret-mode Pallas modules alone spend ~9 min
# compiling on this 1-core host, and test_pallas measured 195 s cold vs
# 35 s warm. The env var (not jax.config) so subprocess workers
# (test_multiworker / test_multihost) inherit it too. First run on a fresh
# checkout is unchanged; repeated runs drop ~3x.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_test_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the sitecustomize pre-imports jax, so the env vars above were read too
# late for THIS process (subprocess workers still inherit them) -- set the
# cache through jax.config as well
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
