"""Spawn-target helper for tests/test_multiworker.py.

Lives in its own module so multiprocessing 'spawn' children import ONLY
this file (lbm2d_tpu.io.results_store -> numpy), not the whole test module
and its JAX-heavy imports.
"""


def hammer(path, lo, hi):
    """set_status on cases [lo, hi) of the store at ``path``."""
    from lbm2d_tpu.io import results_store

    for i in range(lo, hi):
        results_store.set_status(f"c{i}.yaml", "Success", path,
                                 extra_fields={"wall_time_s": i})
