"""Dead-case compaction throughput at large B on the real TPU.

VERDICT round-2 item 5: at B=64 with 25% dead cases, the alive-case
aggregate MLUPS must stay within ~10% of the all-alive number (the
where-freeze otherwise burns a full kernel call per dead case).

Usage: python tools_bench_deadcases.py [B] [SIZE] [DEAD_FRAC]
"""

import sys
import time

import numpy as np


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dead_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.parallel.batch import BatchEngine

    cfg = _demo_config(size, size, nu=0.01, warmup=2000)
    mask = _cylinder_mask(size, size)
    eng = BatchEngine([cfg] * b, [mask] * b, runner="pallas")

    spc, chunks = 100, 6

    def measure(label):
        t0 = time.perf_counter()
        for _ in range(2):
            eng.run_step(spc)
        np.asarray(eng.alive)  # sync
        warm = time.perf_counter() - t0
        n_alive = int(np.asarray(eng.alive).sum())
        t0 = time.perf_counter()
        for _ in range(chunks):
            eng.run_step(spc)
        np.asarray(eng.alive)  # sync
        dt = time.perf_counter() - t0
        mlups = n_alive * size * size * chunks * spc / dt / 1e6
        print(
            f"{label}: alive={n_alive}/{b}  aggregate {mlups:.0f} MLUPS "
            f"({dt / (chunks * spc) * 1e6:.0f} us/chunk-step; "
            f"warm {warm:.0f}s)",
            flush=True,
        )
        return mlups

    full = measure("all-alive")

    n_dead = int(round(b * dead_frac))
    alive = np.ones((b,), bool)
    alive[-n_dead:] = False
    eng.set_state(eng.state, alive)
    compact = measure(f"{n_dead} dead")

    ratio = compact / full
    print(f"alive-aggregate ratio vs all-alive: {ratio:.3f} "
          f"({'PASS' if ratio >= 0.9 else 'FAIL'} >= 0.9)")


if __name__ == "__main__":
    main()
