"""Ad-hoc grid-size throughput probe (not the driver bench).

Usage: python tools_bench_grid.py NY NX [chunks] [steps_per_chunk]
Prints MLUPS for the split-BC fused kernel at the given grid.
STORE_DEV=1 enables f16 deviation storage for the fast steps.
"""

import os
import sys
import time

import numpy as np


def main() -> None:
    ny, nx = int(sys.argv[1]), int(sys.argv[2])
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spc = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    store_dev = os.environ.get("STORE_DEV", "") == "1" or None
    # TILES="bh_fast,bh_full,bw,px" forces the tile geometry (+ split_bc)
    tiles = os.environ.get("TILES")
    tiles = tuple(int(t) for t in tiles.split(",")) if tiles else None
    split = True if tiles else None

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas as run_chunk

    t_setup = time.perf_counter()
    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)

    def sync(x):
        return float(np.asarray(x["max_v"]))

    print(f"setup {time.perf_counter() - t_setup:.1f}s", flush=True)
    t_setup = time.perf_counter()
    for _ in range(3):
        state, mon = run_chunk(
            state, p, n_steps=spc, store_dev=store_dev, tiles=tiles,
            split_bc=split,
        )
    sync(mon)
    print(f"warmup+compile {time.perf_counter() - t_setup:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, mon = run_chunk(
            state, p, n_steps=spc, store_dev=store_dev, tiles=tiles,
            split_bc=split,
        )
    sync(mon)
    dt = time.perf_counter() - t0
    total = n_chunks * spc
    mlups = nx * ny * total / dt / 1e6
    assert bool(np.isfinite(mon["max_v"]))
    print(
        f"{ny}x{nx}: {mlups:.0f} MLUPS  ({dt / total * 1e6:.0f} us/step,"
        f" {total} steps)"
    )


if __name__ == "__main__":
    main()
