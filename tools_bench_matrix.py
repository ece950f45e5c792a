"""Sequential multi-size throughput matrix on the real TPU (one process).

Usage: python tools_bench_matrix.py [ny,nx ...]   (default: full matrix)
"""

import sys
import time

import numpy as np


def bench_one(ny, nx, chunks=6, spc=100):
    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas as run_chunk

    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)

    def sync(x):
        return float(np.asarray(x["max_v"]))

    t0 = time.perf_counter()
    for _ in range(3):
        state, mon = run_chunk(state, p, n_steps=spc)
    sync(mon)
    t_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(chunks):
        state, mon = run_chunk(state, p, n_steps=spc)
    sync(mon)
    dt = time.perf_counter() - t0
    total = chunks * spc
    mlups = ny * nx * total / dt / 1e6
    assert bool(np.isfinite(mon["max_v"]))
    print(
        f"{ny}x{nx}: {mlups:.0f} MLUPS  ({dt / total * 1e6:.0f} us/step;"
        f" warm+compile {t_warm:.0f}s)",
        flush=True,
    )
    return mlups


def main() -> None:
    sizes = [
        (1024, 1024, 20, 500),
        (2048, 2048, 10, 200),
        (4096, 1024, 10, 200),
        (4096, 4096, 6, 100),
        (4736, 2560, 6, 100),
    ]
    if len(sys.argv) > 1:
        sizes = []
        for a in sys.argv[1:]:
            ny, nx = (int(v) for v in a.split(","))
            sizes.append((ny, nx, 6, 100))
    for ny, nx, chunks, spc in sizes:
        try:
            bench_one(ny, nx, chunks, spc)
        except Exception as exc:
            print(f"{ny}x{nx}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
