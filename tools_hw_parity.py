"""Hardware parity check: pipelined+donated Pallas chunk vs the jnp chunk.

Usage: python tools_hw_parity.py [NY NX STEPS]
"""

import sys

import numpy as np


def main() -> None:
    ny = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params, run_chunk
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas

    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))

    got, mon_g = run_chunk_pallas(init_state(ny, nx), p, n_steps=steps)
    ref, mon_r = run_chunk(init_state(ny, nx), p, n_steps=steps)
    gf = np.asarray(got.f)
    rf = np.asarray(ref.f)
    diff = np.abs(gf - rf)
    n_bad = int((diff > 0).sum())
    print(f"{ny}x{nx} {steps} steps: max|df|={diff.max():.3e} "
          f"mismatched={n_bad}/{gf.size}")
    print("force pallas", np.asarray(mon_g["force"]),
          "jnp", np.asarray(mon_r["force"]))
    assert n_bad == 0, "NOT bitwise identical"
    print("BITWISE OK")


if __name__ == "__main__":
    main()
