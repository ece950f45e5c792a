"""Per-module JAX cache hygiene for the CPU test mesh.

The full suite compiles hundreds of 8-device CPU programs (root conftest
forces the virtual mesh). With every compiled executable kept alive for the
whole session, XLA:CPU's compiler eventually segfaults mid-compile deep into
the run (observed twice at tests/test_parallel.py's 2x2-mesh interpret-mode
program, ~50% through the suite; the same test passes in isolation and the
whole module passes alone). Dropping the accumulated executables between
modules keeps the compiler healthy; cross-module cache reuse was near zero
anyway (each module jits its own helpers).
"""

import gc

import jax
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
