"""System utilities (reference utils/system_utils.py role).

The reference purges Taichi's JIT cache between cases (a Windows lockfile
workaround, system_utils.py:6-23); the JAX analogue clears trace/compile
caches to bound host memory across long batches. Also provides the random
mask picker used by exploratory runs.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional


def force_clean_cache() -> None:
    """Clear JAX's in-process caches (jit traces, dispatch caches).

    Safe to call between cases; compiled TPU executables for identical
    programs are re-fetched from the backend/persistent cache, so this trades
    a little re-trace time for bounded host memory in long batch sessions.
    """
    import jax

    jax.clear_caches()


def pick_random_png(directory: str, rng: Optional[random.Random] = None) -> str:
    """Random PNG path from a directory (reference random mask picker)."""
    r = rng or random
    pngs: List[str] = sorted(
        f for f in os.listdir(directory) if f.lower().endswith(".png")
    )
    if not pngs:
        raise FileNotFoundError(f"no PNG files in {directory}")
    return os.path.join(directory, r.choice(pngs))
