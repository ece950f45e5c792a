"""Roofline decomposition of the beyond-VMEM f32 tier (VERDICT r4 item 4).

Measures, at a given square grid (default 4096^2, BASELINE config #5):

1. the split-BC production step (MLUPS, us/step),
2. a pure HBM copy roundtrip over the SAME banded layout (read 9 planes,
   write 9 planes per band -- the kernel's minimum traffic with zero
   arithmetic): the memory-bound speed-of-light for this schedule,
3. the same copy WITHOUT the aux (damp/mask) read, isolating that stream,
4. the fast-band kernel alone vs the edge-BC kernel (tools_probe_4096
   split), re-run here so one quiet session yields every number.

Achieved bytes/cell for the production step are derived from the actual
buffer shapes (padded f in+out, packed aux, exports) and printed as GB/s
against the copy probe and the documented HBM nominal.

Usage: python tools_roofline_4096.py [N] [chunks] [steps_per_chunk]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _time(fn, sync, n, warm=3):
    for _ in range(warm):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main() -> None:
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spc = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    ny = nx = n_grid

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    import lbm2d_tpu.ops.pallas_step as ps
    from lbm2d_tpu.ops.device_specs import current_spec

    spec = current_spec()
    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)

    # ---- production step -------------------------------------------------
    def sync_mon(x):
        return float(np.asarray(x[1]["max_v"]))

    def step_chunk():
        nonlocal state
        state, mon = ps.run_chunk_pallas(state, p, n_steps=spc)
        return state, mon

    dt_chunk = _time(step_chunk, sync_mon, chunks)
    us_step = dt_chunk / spc * 1e6
    mlups = nx * ny / us_step
    print(f"[step]  {mlups:.0f} MLUPS  ({us_step:.0f} us/step)")

    # ---- traffic accounting ---------------------------------------------
    bh, BW, PX = ps._pick_split_tiles(ny, nx)
    Hp = ps._round_up(ny, bh)
    Wp = ps._round_up(nx, BW)
    PY = ps.PY
    f_bytes = 4 * 9 * (Hp + 2 * PY) * (Wp + 2 * PX)
    aux_bytes = 4 * Hp * Wp  # packed damp+mask plane
    ec_w = 128 if (nx - 1) // BW == 0 else 256
    export_bytes = 4 * 3 * (Hp * ec_w + 16 * Wp)
    # per fast step: read f + aux, write f, write exports (halo re-reads are
    # gone since the round-3 scratch carry)
    step_traffic = 2 * f_bytes + aux_bytes + export_bytes
    bytes_per_cell = step_traffic / (nx * ny)
    gbps = step_traffic / (us_step * 1e-6) / 1e9
    print(f"[step]  traffic {bytes_per_cell:.1f} B/cell-step -> "
          f"{gbps:.0f} GB/s achieved "
          f"(nominal {spec.hbm_gbps} GB/s, {spec.name})")

    # ---- copy-roundtrip speed of light over the same band schedule -------
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(f_in, aux, f_out, *, read_aux):
        f_out[...] = f_in[...]
        if read_aux:
            # fold the aux read into the store so it is not dead-code
            f_out[0, :, :] += 0.0 * aux[...]

    def make_copy(read_aux):
        grid = (Hp // bh,)
        kern = functools.partial(copy_kernel, read_aux=read_aux)
        # double-buffered in+out blocks: 4 live f-band copies + aux
        limit = 4 * (4 * 9 * bh * Wp) + 2 * 4 * bh * Wp + 2 * 1024 * 1024
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((9, bh, Wp), lambda i: (0, i, 0)),
                pl.BlockSpec((bh, Wp), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((9, bh, Wp), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((9, Hp, Wp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        )

    fbuf = jnp.zeros((9, Hp, Wp), jnp.float32)
    aux = jnp.zeros((Hp, Wp), jnp.float32)
    for read_aux, tag in ((True, "copy+aux"), (False, "copy")):
        copy = jax.jit(make_copy(read_aux))

        def copy_once(copy=copy):
            return copy(fbuf, aux)

        dt = _time(lambda: copy_once(), lambda x: x.block_until_ready(),
                   chunks * spc // 10, warm=3)
        traffic = 2 * 4 * 9 * Hp * Wp + (4 * Hp * Wp if read_aux else 0)
        print(f"[{tag:9}] {dt * 1e6:.0f} us/pass  "
              f"{traffic / dt / 1e9:.0f} GB/s  "
              f"(equiv {nx * ny / (dt * 1e6) * (step_traffic / traffic):.0f} "
              f"MLUPS at step traffic)")

    # ---- fast-band vs edge kernel split ----------------------------------
    sub = None
    try:
        import subprocess

        sub = subprocess.run(
            [sys.executable, "tools_probe_4096.py", str(n_grid), "40"],
            capture_output=True, text=True, timeout=1200,
        )
        print(sub.stdout.strip().splitlines()[-4:] and
              "\n".join(sub.stdout.strip().splitlines()[-5:]))
    except Exception as exc:  # noqa: BLE001 - optional extra
        print(f"[probe split skipped: {exc}]")

    print(json.dumps({
        "grid": n_grid, "mlups": round(mlups, 1),
        "us_per_step": round(us_step, 1),
        "bytes_per_cell": round(bytes_per_cell, 2),
        "achieved_gbps": round(gbps, 1),
    }))


if __name__ == "__main__":
    main()
